package graft

/** Companion to [[DedupProfile]]'s compression A/B: the OTHER side of
  * the trade. `inMemoryColumnarStorage.compressed=false` saves encode
  * CPU (measured in DedupProfile) but inflates the node-local cache —
  * this main measures by HOW MUCH, materializing the dedup branch-point
  * frame (the wide stage-3 output) both ways and printing the stored
  * bytes from the block manager. The ratio is what decides the default
  * at the 1000-executor shape, where executor memory is the scarce
  * resource and an inflated cache turns memory-resident blocks into
  * disk spill.
  *
  *   sbt 'Test/runMain graft.CacheFootprint /tmp/sf10x'
  */
object CacheFootprint {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10x")
    val spark = ProfileHarness.session()
    def s3(d: String) = Pipeline.deepCleanAndPii(
      Pipeline.cleanAndFilter(
        Pipeline.fromDocuments(Tables.documents(spark, d)), applyNfkc = false),
      collapseRepeats = false)
    Seq(true, false).foreach { comp =>
      spark.conf.set("spark.sql.inMemoryColumnarStorage.compressed", comp)
      val df = s3(dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val rows = df.count()
      val stored = spark.sparkContext.getRDDStorageInfo
        .map(i => i.memSize + i.diskSize).sum
      println(f"FOOTPRINT compressed=$comp%-5s rows=$rows%d " +
        f"bytes=$stored%d (${stored / 1024.0 / 1024.0}%.1f MiB)")
      spark.catalog.clearCache()
    }
    spark.conf.set("spark.sql.inMemoryColumnarStorage.compressed", true)
    spark.stop()
  }
}
