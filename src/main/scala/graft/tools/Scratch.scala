package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("scratch")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    graft.Tables.documents(spark, dir).count()

    val raw = graft.Pipeline.fromDocuments(graft.Tables.documents(spark, dir))
    val s2 = graft.Pipeline.cleanAndFilter(raw)
    time("s2 cleanAndFilter")(println("  n=" + s2.count()))
    val s3 = graft.Pipeline.deepCleanAndPii(s2)
    time("s3 deepCleanAndPii (cum)")(println("  n=" + s3.count()))
    val s4 = graft.Pipeline.dedup(s3)
    time("s4 dedup (cum)")(println("  n=" + s4.count()))
    val s5 = graft.Pipeline.score(s4)
    val s6 = graft.Pipeline.tokenise(s5)
    time("s6 tokenise (cum)")(println("  n=" + s6.count()))
    time("full run again")(println("  n=" + graft.Pipeline.run(raw).count()))
    time("q_pipeline_full")(println("  n=" +
      graft.queries.PipelineQueries.pipelineFull(spark, dir).count()))
    spark.stop()
  }
}
