package graft

import org.apache.spark.sql.DataFrame

/** Decomposition of the dedup slice of the graded chain: how much of
  * `dedupStage`'s cost is the branch-point persist (materializing the
  * wide stage-3 frame to the columnar cache) vs the narrow windows +
  * wide join-back. [[ProfileHarness]] discipline.
  *
  *   sbt 'Test/runMain graft.DedupProfile /tmp/sf100x'
  */
object DedupProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf100x")
    val spark = ProfileHarness.session()
    def s3(d: String) = Pipeline.deepCleanAndPii(
      Pipeline.cleanAndFilter(
        Pipeline.fromDocuments(Tables.documents(spark, d)), applyNfkc = false),
      collapseRepeats = false)
    // the compressed conf is captured at persist() time (CacheManager
    // reads SQLConf when building the InMemoryRelation), so setting it
    // inside the variant builder scopes it to that variant
    def withComp(on: Boolean)(b: => DataFrame): DataFrame = {
      spark.conf.set("spark.sql.inMemoryColumnarStorage.compressed", on)
      b
    }
    import org.apache.spark.storage.StorageLevel
    val variants: Seq[(String, String => DataFrame)] = Seq(
      "s3_plain" -> (d => s3(d)),
      "s3_persist_matzd" -> (d => withComp(true)(s3(d)
        .persist(StorageLevel.MEMORY_AND_DISK))),
      "s3_persist_nocomp" -> (d => withComp(false)(s3(d)
        .persist(StorageLevel.MEMORY_AND_DISK))),
      "dedup_full" -> (d => withComp(true)(graft.ops.Dedup.dedupStage(s3(d),
        textCol = "text_pii_masked", seqCol = "doc_id"))),
      "dedup_full_nocomp" -> (d => withComp(false)(graft.ops.Dedup.dedupStage(
        s3(d), textCol = "text_pii_masked", seqCol = "doc_id"))),
      // storage-strategy A/B for the branch-point frame: disk-only
      // frees executor memory for the window/SMJ sorts (the contention
      // suspect at the 1000x layout), no-persist recomputes the
      // stage-2/3 chain on the second consumer instead of caching
      "dedup_diskonly" -> (d => graft.ops.Dedup.dedupStage(s3(d),
        textCol = "text_pii_masked", seqCol = "doc_id",
        branchCache = Some(StorageLevel.DISK_ONLY))),
      "dedup_nopersist" -> (d => graft.ops.Dedup.dedupStage(s3(d),
        textCol = "text_pii_masked", seqCol = "doc_id",
        branchCache = None)))
    ProfileHarness.run("DEDUP", spark, dir, variants)
    spark.conf.set("spark.sql.inMemoryColumnarStorage.compressed", true)
  }
}
