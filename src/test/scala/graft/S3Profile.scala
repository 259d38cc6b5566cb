package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off decomposition of stage 3's per-row passes (deep-clean →
  * token stats → PII counts → PII mask): cumulative variants over the
  * stage-2 output, same discipline as [[ChainProfile]].
  *
  *   sbt 'Test/runMain graft.S3Profile /tmp/sf100x'
  */
object S3Profile {
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
    import graft.text.{Normalize, Pii, TextMetrics}

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
      "+pii_mask(full_s3)" -> (d => Pipeline.deepCleanAndPii(s2(d),
        collapseRepeats = false)))
    def runOne(fn: String => DataFrame, d: String): Double = {
      val t0 = System.nanoTime()
      try fn(d).write.mode("overwrite").format("noop").save()
      catch { case e: Throwable => println(s"ERR ${e.getMessage}") }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      dt
    }
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    variants.foreach { case (_, fn) => runOne(fn, warmDir) }
    val repeat = sys.env.get("SPARK_GRAFT_BENCH_REPEAT").map(_.toInt).getOrElse(3)
    val mins = collection.mutable.LinkedHashMap.empty[String, Double]
    (1 to repeat).foreach { _ =>
      variants.foreach { case (name, fn) =>
        val dt = runOne(fn, dir)
        mins(name) = mins.get(name).fold(dt)(math.min(_, dt))
      }
    }
    mins.foreach { case (name, v) => println(f"S3 $name%-22s min=$v%8.2f s") }
    spark.stop()
  }
}
