package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Substage decomposition of the graded pipeline chain — the profiling
  * harness behind SCALING.md's "s2 | s3 | dedup | s6-7" tables. Times
  * CUMULATIVE chain prefixes (each prefix is a real fused plan, so the
  * deltas are what a stage adds to the fused chain, not the stage in
  * isolation) with Bench's discipline: untimed sf0.001 warm-up,
  * interleaved passes, min per stage, noop sink, clearCache between
  * runs. Test scope on purpose: a perf-iteration tool, not library
  * surface.
  *
  *   sbt 'Test/runMain graft.ChainProfile /tmp/sf100x'
  */
object ChainProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf100x")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def raw(d: String) = Pipeline.fromDocuments(Tables.documents(spark, d))
    def s2(d: String) = Pipeline.cleanAndFilter(raw(d), applyNfkc = false)
    def s3(d: String) = Pipeline.deepCleanAndPii(s2(d), collapseRepeats = false)
    def dd(d: String) = graft.ops.Dedup.dedupStage(s3(d),
      textCol = "text_pii_masked", seqCol = "doc_id")
    val stages: Seq[(String, String => DataFrame)] = Seq(
      "s2_clean" -> (d => s2(d)),
      "s23_deepclean_pii" -> (d => s3(d)),
      "s234_dedup" -> (d => dd(d)),
      "s2345_graded" -> (d => queries.PipelineQueries.pipelineGraded(spark, d)),
      "s2to7_graded_full" -> (d => queries.PipelineQueries.pipelineGradedFull(spark, d)),
      "full_2to6_nfkc" -> (d => queries.PipelineQueries.pipelineFull(spark, d)))

    def runOne(fn: String => DataFrame, d: String): Double = {
      val t0 = System.nanoTime()
      try fn(d).write.mode("overwrite").format("noop").save()
      catch { case e: Throwable => println(s"ERR ${e.getMessage}") }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      dt
    }
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    stages.foreach { case (_, fn) => runOne(fn, warmDir) }
    val repeat = sys.env.get("SPARK_GRAFT_BENCH_REPEAT").map(_.toInt).getOrElse(3)
    val mins = collection.mutable.LinkedHashMap.empty[String, Double]
    (1 to repeat).foreach { _ =>
      stages.foreach { case (name, fn) =>
        val dt = runOne(fn, dir)
        mins(name) = mins.get(name).fold(dt)(math.min(_, dt))
      }
    }
    var prev = 0.0
    mins.foreach { case (name, v) =>
      val delta = if (name == "full_2to6_nfkc") Double.NaN else v - prev
      if (name != "full_2to6_nfkc") prev = v
      println(f"CHAIN $name%-20s min=$v%8.2f s  delta=$delta%8.2f s")
    }
    spark.stop()
  }
}
