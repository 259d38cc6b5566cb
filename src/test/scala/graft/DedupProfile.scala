package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One-off decomposition of the dedup slice of the graded chain: how
  * much of `dedupStage`'s cost is the branch-point persist
  * (materializing the wide stage-3 frame to the columnar cache) vs the
  * narrow windows + wide join-back. Same discipline as [[ChainProfile]].
  *
  *   sbt 'Test/runMain graft.DedupProfile /tmp/sf100x'
  */
object DedupProfile {
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
    def s3(d: String) = Pipeline.deepCleanAndPii(
      Pipeline.cleanAndFilter(
        Pipeline.fromDocuments(Tables.documents(spark, d)), applyNfkc = false),
      collapseRepeats = false)
    val variants: Seq[(String, String => DataFrame)] = Seq(
      "s3_plain" -> (d => s3(d)),
      "s3_persist_matzd" -> (d => s3(d)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)),
      "dedup_full" -> (d => graft.ops.Dedup.dedupStage(s3(d),
        textCol = "text_pii_masked", seqCol = "doc_id")))
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
    mins.foreach { case (name, v) => println(f"DEDUP $name%-18s min=$v%8.2f s") }
    spark.stop()
  }
}
