package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.queries.{DocQueries, PipelineQueries}

/** Throwaway profiling harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"

    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"SCRATCH $label%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  $n")
    }
    time("quality warm1")(DocQueries.qualityScore(spark, dir).count())
    time("quality warm2")(DocQueries.qualityScore(spark, dir).count())
    time("subset counts")(PipelineQueries.subsetCounts(spark, dir).count())
    time("subset again")(PipelineQueries.subsetCounts(spark, dir).count())
    println(PipelineQueries.subsetCounts(spark, dir).queryExecution
      .optimizedPlan.toString.take(4000))
    spark.stop()
  }
}
