package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct sketches with SET ALGEBRA — the
  * companion to the HLL estimates of
  * [[Report.sketchDistinct]]: HLL unions, but it cannot intersect.
  * KMV keeps the k smallest values of a uniform hash of the key; that
  * bottom-k sample IS a mergeable sketch AND a uniform sample of the
  * distinct universe, so it answers the cross-source curation
  * questions HLL cannot:
  *
  *   - distinct estimate:  (k−1) · M / h₍ₖ₎            (M = hash range)
  *   - union:              bottom-k of the two sketches' union
  *   - Jaccard:            |X ∩ A ∩ B| / |X|  for X = merged sketch
  *   - intersection:       Jaccard · union-estimate
  *
  * ("how much does source A's vocabulary overlap source B's?" drives
  * mixture weighting and near-duplicate SOURCE detection — two crawls
  * of the same site show Jaccard ≈ 1 here long before any document
  * pair is compared.)
  *
  * Everything is deterministic: the hash is an md5 prefix (the
  * engine's content-addressing convention), capped at 52 bits so every
  * hash value, and therefore every estimate, is EXACT in IEEE doubles
  * on both engines — the estimates themselves are DuckDB-oracle-
  * checkable, not just rows-only (unlike the seeded HLL blobs).
  *
  * Scale shape: hash-then-distinct is a keyed shuffle with map-side
  * partial dedup; the sketch aggregator holds ≤ k longs per group at
  * every partial stage (never a collect_set); the set-algebra join is
  * groups × groups — dimension-table sized. 52-bit collisions only
  * matter among the k SMALLEST values per group, i.e. with probability
  * ~k²/2⁵² per group — irrelevant at any scale.
  */
object Kmv {

  /** Hash width in md5 hex chars: 13 ⇒ 52 bits ⇒ every value < 2⁵²
    * is exactly representable in a double, so the (k−1)·M/h₍ₖ₎
    * arithmetic is bit-identical in the JVM and DuckDB.
    */
  val HashHexChars = 13

  /** Hash-range constant M = 2⁵². */
  val HashRange: Double = 4503599627370496.0

  /** 52-bit uniform hash of a key — md5-prefix, mirroring the
    * engine-wide `CAST('0x' || substr(md5(x), 1, 13) AS BIGINT)`
    * DuckDB fragment.
    */
  def hash52(c: Column): Column =
    graft.plans.Md5PrefixLong(c.cast("string"), HashHexChars)

  /** [[hash52]] clamped to ≥ 1 — the sketch-input form. The estimator
    * divides by the k-th smallest hash, so a hash of exactly 0
    * (md5 prefix '0000000000000', ~2⁻⁵² per key) would make the
    * divisor 0: Spark saturates the Infinity→BIGINT cast where DuckDB
    * raises, breaking oracle parity in the one place the engines
    * disagree. Mapping 0→1 costs a 2⁻⁵² collision and keeps every
    * divisor positive on both engines (the oracle SQL applies the
    * same `greatest(h, 1)`).
    */
  def hash52Pos(c: Column): Column = greatest(hash52(c), lit(1L))

  /** Sketch buffer: ascending distinct hash values, at most k. */
  case class Hashes(hs: Seq[Long])

  /** Bounded bottom-k-distinct aggregator. Per-buffer state is O(k) at
    * every partial-aggregation stage; merge is set-union-then-trim, so
    * the result is partition-order-proof (a sorted distinct bottom-k
    * has exactly one value).
    */
  private class MinKDistinct(k: Int)
      extends Aggregator[Long, Hashes, Hashes] {
    override def zero: Hashes = Hashes(Vector.empty)
    // Buffer invariant (zero/reduce/merge all preserve it): `hs` is
    // ascending and distinct, length ≤ k. reduce is a binary-search
    // insert; the old `(hs :+ a).distinct.sorted.take(k)` re-sorted
    // the whole buffer per element while warming — O(k log k)
    // allocation per row for an identical result.
    override def reduce(b: Hashes, a: Long): Hashes = {
      val hs = b.hs
      val n = hs.length
      // warm-buffer fast path: full and a is no smaller than the max
      if (n >= k && a >= hs(n - 1)) b
      else {
        var lo = 0; var hi = n
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (hs(mid) < a) lo = mid + 1 else hi = mid
        }
        if (lo < n && hs(lo) == a) b // already present
        else {
          val m = math.min(n + 1, k)
          val out = new Array[Long](m)
          var i = 0
          while (i < m) {
            out(i) = if (i < lo) hs(i) else if (i == lo) a else hs(i - 1)
            i += 1
          }
          Hashes(out.toVector)
        }
      }
    }
    // Linear merge of two ascending-distinct buffers, stopping at k.
    override def merge(b1: Hashes, b2: Hashes): Hashes = {
      val x = b1.hs; val y = b2.hs
      if (x.isEmpty) b2
      else if (y.isEmpty) b1
      else {
        val out = new scala.collection.mutable.ArrayBuffer[Long](
          math.min(x.length + y.length, k))
        var i = 0; var j = 0
        while (out.length < k && (i < x.length || j < y.length)) {
          val v =
            if (j >= y.length || (i < x.length && x(i) <= y(j))) {
              val t = x(i); i += 1; t
            } else { val t = y(j); j += 1; t }
          if (out.isEmpty || out(out.length - 1) != v) out += v
        }
        Hashes(out.toVector)
      }
    }
    override def finish(r: Hashes): Hashes = r
    override def bufferEncoder: Encoder[Hashes] = Encoders.product[Hashes]
    override def outputEncoder: Encoder[Hashes] = Encoders.product[Hashes]
  }

  /** UDAF form: `bottomK(k)(hashCol)` → struct(hs: array<bigint>). */
  def bottomK(k: Int) = udaf(new MinKDistinct(k), Encoders.scalaLong)

  /** Distinct estimate from a sketch column (array<bigint>, ascending):
    * exact size below k (the sketch IS the universe), (k−1)·M/h₍ₖ₎ at
    * k. Returned quantized (floor) as BIGINT so downstream hashing is
    * representation-proof.
    */
  def estimateQ(sk: Column, k: Int): Column =
    when(size(sk) < k, size(sk).cast("long"))
      .otherwise(floor(lit((k - 1).toDouble * HashRange) /
        element_at(sk, least(lit(k), size(sk))).cast("double"))
        .cast("long"))

  /** Per-group KMV sketches over the distinct values of `keyCol`:
    * (group, n_exact, sketch, est_q). `n_exact` is the true distinct
    * count — free here because the sketch input is already the
    * distinct frame (at 100 TB you would drop it and keep only the
    * estimate; the fixture keeps it so the spec can pin relative
    * error).
    */
  def sketchDistinct(df: DataFrame, keyCol: String, groupCol: String,
                     k: Int): DataFrame =
    df.select(col(groupCol).cast("string").as("group"),
        hash52Pos(col(keyCol)).as("h"))
      .distinct()
      .groupBy("group")
      .agg(count(lit(1)).as("n_exact"),
        bottomK(k)(col("h")).as("skw"))
      .select(col("group"), col("n_exact"), col("skw.hs").as("sk"))

  /** Pairwise set-algebra report over the per-group sketches:
    * for every unordered group pair (a < b), the two distinct
    * estimates, the union estimate, the quantized Jaccard, and the
    * intersection estimate — all from the sketches alone.
    */
  def overlapReport(sketches: DataFrame, k: Int): DataFrame = {
    val a = sketches.select(col("group").as("group_a"),
      col("n_exact").as("n_a"), col("sk").as("sk_a"))
    val b = sketches.select(col("group").as("group_b"),
      col("n_exact").as("n_b"), col("sk").as("sk_b"))
    // X = bottom-k of the union of the two sketches — itself a valid
    // KMV sketch of A ∪ B (the bottom-k of a union is contained in
    // the union of the bottom-ks)
    val x = slice(array_sort(array_distinct(
      concat(col("sk_a"), col("sk_b")))), 1, k)
    val inBoth = size(array_intersect(array_intersect(x, col("sk_a")),
      col("sk_b"))).cast("long")
    val unionEst =
      when(size(x) < k, size(x).cast("double"))
        .otherwise(lit((k - 1).toDouble * HashRange) /
          element_at(x, least(lit(k), size(x))).cast("double"))
    // EXPLICIT broadcast: the sketch table is groups × O(k) BY
    // CONSTRUCTION (aggregate output), but Spark's size ESTIMATE for
    // it scales with the un-aggregated input, so at big file stats
    // the non-equi join silently loses its BroadcastNestedLoopJoin
    // plan and falls back to CartesianProduct — the 100× PlanSweep
    // caught exactly that. The hint pins the always-correct shape.
    a.join(broadcast(b), col("group_a") < col("group_b"))
      .select(col("group_a"), col("group_b"), col("n_a"), col("n_b"),
        estimateQ(col("sk_a"), k).as("est_a_q"),
        estimateQ(col("sk_b"), k).as("est_b_q"),
        floor(unionEst).cast("long").as("union_est_q"),
        floor(inBoth.cast("double") * 10000.0 /
          size(x).cast("double")).cast("long").as("jaccard_q"),
        floor(inBoth.cast("double") / size(x).cast("double") * unionEst)
          .cast("long").as("inter_est_q"))
  }
}
