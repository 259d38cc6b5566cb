package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway profiling/smoke harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"

    def time(name: String)(df: => DataFrame): Unit = {
      df.write.mode("overwrite").format("noop").save()
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      println(f"SCRATCH $name%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val docs = graft.Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    import graft.text._
    time("baseline_text")(docs)
    time("normalize")(docs.select(Normalize.normalizeText(col("text")).as("n")))
    time("langid")(LangId.withLangColumns(docs, col("text")))
    time("pii_counts")(docs.select(Pii.piiEmailHits(col("text")),
      Pii.piiPhoneHits(col("text")), Pii.piiCcHits(col("text")),
      Pii.piiIbanHits(col("text"))))
    time("pii_mask")(docs.select(Pii.maskPii(col("text")).as("m")))
    time("toxicity")(Toxicity.withToxicityColumns(docs, col("text")))
    time("token_stats")(docs.select(
      TextMetrics.tokenCount(col("text")).as("tc")))
    time("structural")(docs.select(
      Normalize.structuralCleanup(col("text")).as("s")))
    time("tokenize")(docs.select(Tokenize.tokenize(col("text")).as("t")))
    spark.stop()
  }
}
