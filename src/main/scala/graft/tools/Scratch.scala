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

    // ---- graded chain prefixes (stages 2-5 / +6 / +7) ----
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
    val cA = minOf3("curation gates (gopher+C4)") { gates.count() }
    val cB = minOf3("curation +dedup") { dd.count() }
    val cC = minOf3("curation +budget") { sel.count() }
    val cD = minOf3("curation full (curationE2e)") {
      DocQueries.curationE2e(spark, dir).count()
    }
    println(f"CURATION stages: gates $cA%.2f s | dedup ${cB - cA}%.2f s | " +
      f"budget ${cC - cB}%.2f s | assemble ${cD - cC}%.2f s | total $cD%.2f s")

    spark.stop()
  }
}
