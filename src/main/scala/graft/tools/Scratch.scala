package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway profiling/smoke harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = graft.SparkEntry.entry(spark).count()
    println(s"SCRATCH entry rows=$rows")
    spark.stop()
  }
}
