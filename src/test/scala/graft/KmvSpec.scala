package graft

import org.apache.spark.sql.functions._

import graft.ops.Kmv

/** KMV sketch properties: estimator accuracy, sketch mergeability, and
  * partition-order independence — plus the overlap report's set-algebra
  * identities on constructed universes with KNOWN overlap.
  */
class KmvSpec extends SparkTestBase {
  import spark.implicits._

  private val K = 64

  test("distinct estimate: exact below k, within KMV error bounds at k") {
    // universe far above k: estimate within ~4/sqrt(k) relative error
    val big = (0 until 20000).map(i => ("a", s"tok_$i")).toDF("g", "v")
    val est = Kmv.sketchDistinct(big, "v", "g", K)
      .select(Kmv.estimateQ(col("sk"), K)).as[Long].head()
    val rel = math.abs(est - 20000.0) / 20000.0
    assert(rel < 4.0 / math.sqrt(K), s"estimate $est off by $rel")
    // universe below k: the sketch IS the universe, estimate exact
    val small = (0 until 40).map(i => ("a", s"tok_$i")).toDF("g", "v")
    val exact = Kmv.sketchDistinct(small, "v", "g", K)
      .select(Kmv.estimateQ(col("sk"), K)).as[Long].head()
    assert(exact === 40L)
  }

  test("sketch-input hash is clamped positive: the estimator divisor can never be 0") {
    // hash52 CAN yield 0 (md5 prefix '0000000000000', ~2^-52 per key):
    // the estimate divides by the k-th smallest hash, and a 0 divisor
    // splits the engines (Spark saturates Infinity->BIGINT, DuckDB
    // raises). hash52Pos maps 0->1; pin that the clamp composes with
    // hash52 (identical on ordinary keys, floor of 1 always) and that
    // the sketch path uses the clamped form.
    val keys = (0 until 1000).map(i => s"key_$i").toDF("v")
    val both = keys.select(Kmv.hash52(col("v")).as("h"),
      Kmv.hash52Pos(col("v")).as("hp")).collect()
    both.foreach { r =>
      assert(r.getLong(1) >= 1L)
      assert(r.getLong(1) === math.max(r.getLong(0), 1L))
    }
    val sk = Kmv.sketchDistinct(keys.select(lit("g").as("g"), col("v")),
      "v", "g", K).select(explode(col("sk"))).as[Long].collect()
    assert(sk.forall(_ >= 1L), "sketch contains a non-positive hash")
  }

  test("sketch is duplicate-proof and partition-order-proof") {
    val vals = (0 until 5000).map(i => ("a", s"tok_${i % 1000}"))
    val once = Kmv.sketchDistinct(vals.toDF("g", "v"), "v", "g", K)
      .select("sk").as[Seq[Long]].head()
    // duplicates cannot shift the bottom-k of the DISTINCT universe
    val dedup = Kmv.sketchDistinct(
      vals.distinct.toDF("g", "v").repartition(7), "v", "g", K)
      .select("sk").as[Seq[Long]].head()
    assert(once === dedup)
    assert(once.length === K && once === once.distinct.sorted)
  }

  test("aggregator equals distinct.sorted.take(k) on adversarial shapes") {
    // Exercises the binary-search insert (front/middle/back positions,
    // duplicate hits, underfull buffers) and the linear sorted merge
    // (early-stop at k, one side exhausted) against the one-line
    // reference semantics, across ks straddling the universe size.
    val rng = new scala.util.Random(0x5eed)
    for (k <- Seq(1, 3, 64, 500); rep <- 0 until 3) {
      val n = 200 + rng.nextInt(300)
      // small value domain forces heavy duplication
      val vals = Seq.fill(n)(rng.nextInt(120).toLong)
      val expected = vals.distinct.sorted.take(k)
      val got = vals.map(("g", _)).toDF("g", "h").repartition(11)
        .groupBy("g").agg(Kmv.bottomK(k)(col("h")).as("skw"))
        .select(col("skw.hs")).as[Seq[Long]].head()
      assert(got === expected, s"k=$k rep=$rep")
    }
    // descending + ascending feed orders through ONE partition each:
    // pins the reduce path alone (every insert lands at the front /
    // the back respectively)
    val desc = (500 to 1 by -1).map(v => ("g", v.toLong)).toDF("g", "h").coalesce(1)
      .groupBy("g").agg(Kmv.bottomK(64)(col("h")).as("skw"))
      .select(col("skw.hs")).as[Seq[Long]].head()
    assert(desc === (1L to 64L))
  }

  test("merged bottom-k of two sketches = sketch of the unioned universe") {
    val ua = (0 until 3000).map(i => s"tok_$i")
    val ub = (1500 until 4500).map(i => s"tok_$i")
    def sketchOf(vs: Seq[String]) =
      Kmv.sketchDistinct(vs.map(("g", _)).toDF("g", "v"), "v", "g", K)
        .select("sk").as[Seq[Long]].head()
    val merged = (sketchOf(ua) ++ sketchOf(ub)).distinct.sorted.take(K)
    assert(merged === sketchOf((ua ++ ub).distinct))
  }

  test("overlap report recovers a constructed 50% overlap") {
    // |A| = |B| = 4000, |A ∩ B| = 2000, |A ∪ B| = 6000 → Jaccard 1/3
    val a = (0 until 4000).map(i => ("a", s"tok_$i"))
    val b = (2000 until 6000).map(i => ("b", s"tok_$i"))
    val sk = Kmv.sketchDistinct((a ++ b).toDF("g", "v"), "v", "g", K)
    val r = Kmv.overlapReport(sk, K).collect().head
    assert(r.getAs[String]("group_a") === "a")
    assert(r.getAs[Long]("n_a") === 4000L && r.getAs[Long]("n_b") === 4000L)
    val unionEst = r.getAs[Long]("union_est_q")
    val jac = r.getAs[Long]("jaccard_q") / 10000.0
    val interEst = r.getAs[Long]("inter_est_q")
    assert(math.abs(unionEst - 6000.0) / 6000.0 < 4.0 / math.sqrt(K),
      s"union est $unionEst")
    // Jaccard from a k-sample: binomial noise, allow a loose band
    assert(jac > 0.15 && jac < 0.55, s"jaccard $jac (true 1/3)")
    assert(interEst > 500 && interEst < 4500,
      s"intersection est $interEst (true 2000)")
    // disjoint groups: zero Jaccard, zero intersection — exactly
    val c = (10000 until 14000).map(i => ("c", s"tok_$i"))
    val sk2 = Kmv.sketchDistinct((a ++ c).toDF("g", "v"), "v", "g", K)
    val r2 = Kmv.overlapReport(sk2, K).collect().head
    assert(r2.getAs[Long]("jaccard_q") === 0L)
    assert(r2.getAs[Long]("inter_est_q") === 0L)
  }
}
