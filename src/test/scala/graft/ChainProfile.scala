package graft

import org.apache.spark.sql.DataFrame

/** Substage decomposition of the graded pipeline chain — the profiling
  * harness behind SCALING.md's "s2 | s3 | dedup | s6-7" tables. Times
  * CUMULATIVE chain prefixes (each prefix is a real fused plan, so the
  * deltas are what a stage adds to the fused chain, not the stage in
  * isolation) with [[ProfileHarness]]'s bench discipline. Test scope on
  * purpose: a perf-iteration tool, not library surface.
  *
  *   sbt 'Test/runMain graft.ChainProfile /tmp/sf100x'
  */
object ChainProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf100x")
    val spark = ProfileHarness.session()
    def raw(d: String) = Pipeline.fromDocuments(Tables.documents(spark, d))
    def s2(d: String) = Pipeline.cleanAndFilter(raw(d), applyNfkc = false)
    def s3(d: String) = Pipeline.deepCleanAndPii(s2(d), collapseRepeats = false)
    def dd(d: String) = graft.ops.Dedup.dedupStage(s3(d),
      textCol = "text_pii_masked", seqCol = "doc_id")
    val variants: Seq[(String, String => DataFrame)] = Seq(
      "s2_clean" -> (d => s2(d)),
      "s23_deepclean_pii" -> (d => s3(d)),
      "s234_dedup" -> (d => dd(d)),
      "s2345_graded" -> (d => queries.PipelineQueries.pipelineGraded(spark, d)),
      "s2to7_graded_full" -> (d => queries.PipelineQueries.pipelineGradedFull(spark, d)),
      "full_2to6_nfkc" -> (d => queries.PipelineQueries.pipelineFull(spark, d)))
    ProfileHarness.run("CHAIN", spark, dir, variants)
  }
}
