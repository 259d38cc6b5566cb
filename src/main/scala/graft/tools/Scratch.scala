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
    // bench-style: warm on sf0.001, then time fresh query builds on sf0.1
    graft.queries.SimilarityQueries.pqSearch(spark, "/root/testdata/sf0.001").count()
    graft.queries.SimilarityQueries.pqEncode(spark, "/root/testdata/sf0.001").count()
    (1 to 3).foreach { i =>
      time(s"q_pq_encode run $i") {
        graft.queries.SimilarityQueries.pqEncode(spark, dir).count()
      }
    }
    (1 to 3).foreach { i =>
      time(s"q_pq_search run $i") {
        graft.queries.SimilarityQueries.pqSearch(spark, dir).count()
      }
    }
    spark.stop()
  }
}
