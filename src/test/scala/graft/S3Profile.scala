package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Decomposition of stage 3's per-row passes (deep-clean → token stats
  * → fused PII scan): cumulative variants over the stage-2 output,
  * [[ProfileHarness]] discipline.
  *
  *   sbt 'Test/runMain graft.S3Profile /tmp/sf100x'
  */
object S3Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf100x")
    val spark = ProfileHarness.session()
    import graft.text.{Normalize, TextMetrics}
    def s2(d: String) = Pipeline.cleanAndFilter(
      Pipeline.fromDocuments(Tables.documents(spark, d)), applyNfkc = false)
    def cleaned(d: String) = s2(d).withColumn("text_deep_clean",
      Normalize.structuralCleanupNoRepeats(col("text_norm")))
    val t = col("text_deep_clean")
    val variants: Seq[(String, String => DataFrame)] = Seq(
      "s2_base" -> (d => s2(d)),
      "cleanup(strip+boiler)" -> (d => cleaned(d)),
      "strip_only" -> (d => s2(d).withColumn("text_deep_clean",
        graft.plans.StripTags(col("text_norm")))),
      "+tokenstats" -> (d => TextMetrics.withTokenStats(cleaned(d), t)),
      "+pii_counts" -> (d => TextMetrics.withTokenStats(cleaned(d), t)
        .withColumn("__pii", graft.plans.PiiCounts(t))),
      "+pii_scan(full_s3)" -> (d => Pipeline.deepCleanAndPii(s2(d),
        collapseRepeats = false)))
    ProfileHarness.run("S3", spark, dir, variants)
  }
}
