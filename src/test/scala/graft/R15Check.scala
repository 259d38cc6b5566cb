package graft

/** Result-equivalence gate for the R15Profile rewrite candidates: each
  * candidate must be row-identical (both-ways except) to the current
  * declared query at the given SF before any timing A/B counts.
  *
  *   sbt 'Test/runMain graft.R15Check /root/testdata/sf0.01'
  */
object R15Check {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = ProfileHarness.session()
    def diff(name: String, a: org.apache.spark.sql.DataFrame,
             b: org.apache.spark.sql.DataFrame): Unit = {
      val extra = b.exceptAll(a).count()
      val missing = a.exceptAll(b).count()
      val n = a.count()
      println(s"CHECK $name rows=$n extra=$extra missing=$missing " +
        (if (extra == 0 && missing == 0) "OK" else "MISMATCH"))
      spark.catalog.clearCache()
    }
    // re-build the candidate frames through R15Profile's own code paths
    // (single source of truth): invoke via reflection-free copy is
    // avoided — R15Profile exposes them through the variant groups, so
    // here we just rebuild the two variant sets it defines.
    R15Variants.all(spark, dir).foreach { case (name, cur, cand) =>
      diff(name, cur(dir), cand(dir))
    }
    spark.stop()
  }
}
