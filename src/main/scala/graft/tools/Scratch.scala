package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling harness (not part of the library surface).
  *
  * Current contents: the round-10 100× stage breakdown of the two
  * end-to-end chains (q_pipeline_graded_full, q_curation_e2e) — each
  * cumulative prefix timed min-of-3 after an sf0.001 warm-up, so stage
  * walls are differences of steady-state prefix walls.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("scratch")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/tmp/sf100x")
    val warm = "/root/testdata/sf0.001"

    def minOf3(label: String)(f: => Long): Double = {
      val times = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val n = f
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"  $label%-34s $dt%7.2f s ($n rows)")
        dt
      }
      val m = times.min
      println(f"$label%-36s min $m%7.2f s")
      m
    }

    import graft.queries.{DocQueries, PipelineQueries}

    // focused mode: only the curation budget/full prefixes (A/B of the
    // two-pass running-total persist)
    val curationOnly = args.contains("--curation-budget")

    // focused mode: decompose cleanAndFilter itself (the dominant s2-5
    // sub-stage) into its per-row kernel families
    if (args.contains("--clean-profile")) {
      import graft.{Pipeline, Tables}
      import graft.text.{LangId, Normalize, TextMetrics, Toxicity}
      def mat(df: org.apache.spark.sql.DataFrame): Long = {
        df.write.mode("overwrite").format("noop").save(); 0L
      }
      def raw = Pipeline.fromDocuments(Tables.documents(spark, dir))
      def n1 = raw.withColumn("text_norm",
        Normalize.normalizeText(col("text"), applyNfkc = false))
      def n2 = n1
        .withColumn("char_len", TextMetrics.charLen(col("text_norm")))
        .withColumn("word_count", TextMetrics.wordCount(col("text_norm")))
      def n3 = Toxicity.withToxicityColumns(
        LangId.withLangColumns(n2, col("text_norm")), col("text_norm"))
      def n4 = n3
        .withColumn("alpha_ratio", TextMetrics.alphaRatio(col("text_norm")))
        .withColumn("repetition_ratio",
          TextMetrics.repetitionRatio(col("text_norm")))
        .withColumn("non_latin_ratio",
          TextMetrics.nonLatinRatio(col("text_norm")))
      def n5 = Pipeline.cleanAndFilter(raw, applyNfkc = false)
      mat(n5) // warm-up
      val p1 = minOf3("P1 normalize only") { mat(n1) }
      val p2 = minOf3("+char/word metrics") { mat(n2) }
      val p3 = minOf3("+langid+toxicity") { mat(n3) }
      val p4 = minOf3("+ratio metrics") { mat(n4) }
      val p5 = minOf3("full cleanAndFilter") { mat(n5) }
      println(f"CLEAN PROFILE: norm $p1%.2f | cw ${p2 - p1}%.2f | " +
        f"lang+tox ${p3 - p2}%.2f | ratios ${p4 - p3}%.2f | " +
        f"filters+pii ${p5 - p4}%.2f | total $p5%.2f")
      spark.stop()
      return
    }

    // focused mode: decompose stage 3 (deepCleanAndPii) per-row work
    // into its per-pattern regex walls — which mask/count pattern
    // dominates the deep-clean/PII slice?
    if (args.contains("--mask-profile")) {
      import graft.{Pipeline, Tables}
      import graft.text.{Normalize, Pii, TextMetrics}
      def mat(df: org.apache.spark.sql.DataFrame): Long = {
        df.write.mode("overwrite").format("noop").save(); 0L
      }
      def base = Pipeline.cleanAndFilter(
        Pipeline.fromDocuments(Tables.documents(spark, dir)),
        applyNfkc = false)
      def m0 = base.withColumn("text_deep_clean",
        Normalize.structuralCleanupNoRepeats(col("text_norm")))
      val t = col("text_deep_clean")
      def m1 = TextMetrics.withTokenStats(m0, t)
      def m2 = m1.withColumn("e", graft.plans.EmailMask(t))
      def m3 = m2.withColumn("p", regexp_replace(col("e"), Pii.PhoneRe, "<PHONE>"))
      def m4 = m3.withColumn("c", regexp_replace(col("p"), Pii.CreditCardRe, "<CREDIT_CARD>"))
      def m5 = m4.withColumn("i", regexp_replace(col("c"), Pii.IbanRe, "<IBAN>"))
      def m6 = m5.withColumn("he", Pii.piiEmailHits(t))
      def m7 = m6.withColumn("hp", Pii.piiPhoneHits(t))
      def m8 = m7.withColumn("hc", Pii.piiCcHits(t))
      def m9 = m8.withColumn("hi", Pii.piiSsnHits(t)).withColumn("hib", Pii.piiIbanHits(t))
      mat(m9) // warm-up
      val w0 = minOf3("s3 structural clean") { mat(m0) }
      val w1 = minOf3("+token stats") { mat(m1) }
      val w2 = minOf3("+email mask") { mat(m2) }
      val w3 = minOf3("+phone mask") { mat(m3) }
      val w4 = minOf3("+cc mask") { mat(m4) }
      val w5 = minOf3("+iban mask") { mat(m5) }
      val w6 = minOf3("+email count") { mat(m6) }
      val w7 = minOf3("+phone count") { mat(m7) }
      val w8 = minOf3("+cc count") { mat(m8) }
      val w9 = minOf3("+iban+ssn count") { mat(m9) }
      println(f"MASK PROFILE: clean $w0%.2f | tokstats ${w1 - w0}%.2f | " +
        f"emask ${w2 - w1}%.2f | pmask ${w3 - w2}%.2f | ccmask ${w4 - w3}%.2f | " +
        f"ibmask ${w5 - w4}%.2f | ecnt ${w6 - w5}%.2f | pcnt ${w7 - w6}%.2f | " +
        f"cccnt ${w8 - w7}%.2f | ibcnt ${w9 - w8}%.2f | total $w9%.2f")
      spark.stop()
      return
    }

    // focused mode: decompose the graded chain's dominant s2-5 prefix
    // into its sub-stages (clean -> deepclean/PII -> dedup -> score)
    if (args.contains("--graded-substages")) {
      import graft.{Pipeline, Tables}
      def raw = Pipeline.fromDocuments(Tables.documents(spark, dir))
      def c1 = Pipeline.cleanAndFilter(raw, applyNfkc = false)
      def c2 = Pipeline.deepCleanAndPii(c1, collapseRepeats = false)
      def c3 = graft.ops.Dedup.dedupStage(c2,
        textCol = "text_pii_masked", seqCol = "doc_id")
      def c4 = Pipeline.score(c3)
      // noop sink, not count(): count() lets Catalyst prune the whole
      // scalar chain out of the prefix stages (c1/c2 would measure as a
      // bare scan), while the dedup stage's persist forces it — the
      // noop write makes every prefix pay its honest per-row cost
      def mat(df: org.apache.spark.sql.DataFrame): Long = {
        df.write.mode("overwrite").format("noop").save(); 0L
      }
      mat(c4) // warm-up at the measured dir (JIT + codegen)
      val t1 = minOf3("s2 clean+filter") { mat(c1) }
      val t2 = minOf3("s2-3 +deepclean/PII") { mat(c2) }
      val t3 = minOf3("s2-4 +dedup") { mat(c3) }
      val t4 = minOf3("s2-5 +score") { mat(c4) }
      println(f"S2-5 SUBSTAGES: clean $t1%.2f s | deepclean/pii " +
        f"${t2 - t1}%.2f s | dedup ${t3 - t2}%.2f s | score ${t4 - t3}%.2f s" +
        f" | total $t4%.2f s")
      spark.stop()
      return
    }

    // ---- graded chain prefixes (stages 2-5 / +6 / +7) ----
    if (!curationOnly) {
    PipelineQueries.pipelineGradedFull(spark, warm).count() // warm-up
    val g25 = minOf3("graded s2-5 (pipelineGraded)") {
      PipelineQueries.pipelineGraded(spark, dir).count()
    }
    val g26 = minOf3("graded s2-6 (+tokenise/gates)") {
      PipelineQueries.gradedFullGated(spark, dir).count()
    }
    val g27 = minOf3("graded s2-7 (full chain)") {
      PipelineQueries.pipelineGradedFull(spark, dir).count()
    }
    println(f"GRADED stages: s2-5 $g25%.2f s | s6 ${g26 - g25}%.2f s | " +
      f"s7 ${g27 - g26}%.2f s | total $g27%.2f s")
    }

    // ---- curation gauntlet prefixes (mirrors DocQueries.curationE2e) ----
    DocQueries.curationE2e(spark, warm).count() // warm-up
    import graft.ops.{Curation, Dedup, Sampling}
    def docs = graft.Tables.documents(spark, dir)
    def gates = {
      val g = Curation.gopherRules(Curation.gopherSignals(docs, "text"))
        .select(col("doc_id"),
          when(col("gopher_reason") === "insufficient_stopwords", lit(null))
            .otherwise(col("gopher_reason")).as("gopher_reason"))
      val c = Curation.c4Rules(docs).select(col("doc_id"), col("c4_reason"))
      docs.select("doc_id").join(g, Seq("doc_id")).join(c, Seq("doc_id"))
    }
    def dd = {
      val survivors = gates
        .filter(col("gopher_reason").isNull && col("c4_reason").isNull)
        .select("doc_id")
      Dedup.exactDedup(docs.join(survivors, Seq("doc_id")), textCol = "text")
        .select(col("doc_id"), col("is_dup_exact"))
    }
    def sel = {
      val scored = DocQueries.qualityScore(spark, dir)
        .select("doc_id", "token_count", "quality_score")
        .join(dd.filter(!col("is_dup_exact")).select("doc_id"), Seq("doc_id"))
      Sampling.budgetSelect(scored, "doc_id", "quality_score",
        "token_count", 10000L)
    }
    val cB = minOf3("curation +dedup") { dd.count() }
    val cC = minOf3("curation +budget") { sel.count() }
    if (!curationOnly) {
      val cA = minOf3("curation gates (gopher+C4)") { gates.count() }
      val cD = minOf3("curation full (curationE2e)") {
        DocQueries.curationE2e(spark, dir).count()
      }
      println(f"CURATION stages: gates $cA%.2f s | dedup ${cB - cA}%.2f s | " +
        f"budget ${cC - cB}%.2f s | assemble ${cD - cC}%.2f s | total $cD%.2f s")
    } else {
      val cD = minOf3("curation full (curationE2e)") {
        DocQueries.curationE2e(spark, dir).count()
      }
      println(f"CURATION A/B: dedup-prefix $cB%.2f s | budget stage " +
        f"${cC - cB}%.2f s | full $cD%.2f s")
    }

    spark.stop()
  }
}
