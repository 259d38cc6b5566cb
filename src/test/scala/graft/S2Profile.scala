package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Decomposition of stage 2's per-row passes (normalize → prefilter →
  * fused lang/tox profile → metrics → reason ladder): cumulative
  * variants, [[ProfileHarness]] discipline.
  *
  *   sbt 'Test/runMain graft.S2Profile /tmp/sf100x'
  */
object S2Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf100x")
    val spark = ProfileHarness.session()
    import graft.text.{LangId, Normalize, Pii, TextMetrics}
    import graft.ops.Filters
    def raw(d: String) = Pipeline.fromDocuments(Tables.documents(spark, d))
    def norm(d: String) = raw(d)
      .withColumn("text_norm",
        Normalize.normalizeText(col("text"), applyNfkc = false))
      .withColumn("char_len", TextMetrics.charLen(col("text_norm")).cast("long"))
      .withColumn("word_count", TextMetrics.wordCount(col("text_norm")).cast("long"))
    def pre(d: String) = Filters.applyRules(norm(d), Filters.prefilterRules(
      col("text"), col("text_norm"), col("char_len"), col("word_count")))
    def langtox(d: String) = LangId.withLangToxColumns(pre(d), col("text_norm"))
    def metrics(d: String) = {
      val t = col("text_norm")
      langtox(d)
        .withColumn("n_chars", TextMetrics.nChars(t))
        .withColumn("n_words", TextMetrics.wordCount(t).cast("long"))
        .withColumn("alpha_ratio", TextMetrics.alphaRatio(t))
        .withColumn("repetition_ratio", TextMetrics.repetitionRatio(t))
        .withColumn("non_latin_ratio", TextMetrics.nonLatinRatio(t))
        .withColumn("email_hits", Pii.emailHits(t).cast("long"))
        .withColumn("phone_hits", Pii.phoneHitsSimple(t).cast("long"))
        .withColumn("model_q", lit(0.5))
    }
    val variants: Seq[(String, String => DataFrame)] = Seq(
      "scan_ingest" -> (d => raw(d)),
      "+norm" -> (d => norm(d)),
      "+prefilter" -> (d => pre(d)),
      "+langtox" -> (d => langtox(d)),
      "+metrics" -> (d => metrics(d)),
      "full_s2" -> (d => Pipeline.cleanAndFilter(raw(d), applyNfkc = false)))
    ProfileHarness.run("S2", spark, dir, variants)
  }
}
