package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005 —
  * public literature): point-frequency estimates over an unbounded key
  * universe in O(depth × width) state. The missing member of the
  * sketch family next to KMV (distincts + set algebra), HLL
  * (distincts), and DDSketch (quantiles): "how often does token X
  * occur in 100 TB" WITHOUT a vocabulary-wide shuffle — the sketch is
  * a fixed 4×256 grid of counters, every cell a plain SUM, so it
  * partial-aggregates map-side (each executor reduces its split to
  * ≤1024 cells before any shuffle) and merges across shards by
  * addition. Guarantee: est ≥ true always (counters only over-count
  * via collisions), and est ≤ true + e·n/width with probability
  * 1 − e^−depth.
  *
  * Determinism is the design constraint here (same reason the KMV/HLL
  * twins use md5): the depth row hashes are md5("j:" ++ token) first
  * 16 bits mod width — portable, seedless, identical in DuckDB — so
  * sketch CELLS and point ESTIMATES are both exact integers the oracle
  * replays, not a rows-only estimate class.
  */
object CountMin {

  val Depth = 4
  val Width = 256

  /** Row-j bucket of a token: first 16 bits of md5("j:" ++ tok) mod
    * Width. The hash yields ≤0xffff, so the mod domain is nonnegative
    * in both engines. Fused [[graft.plans.Md5PrefixLong]] kernel —
    * bit-identical to the conv(substring(md5(concat(...)),1,4),16,10)
    * form the oracle replays (PlanSpec parity pin), without that form's
    * three intermediate strings per (row, j).
    */
  def bucket(j: Int, tok: Column, width: Int = Width): Column =
    graft.plans.Md5PrefixLong(tok, j + ":", 4) % width

  /** The sketch: (j, b, c) cells summed over one exploded token column.
    * ≤ Depth×Width rows regardless of vocabulary size.
    */
  def sketch(toks: DataFrame, tokCol: String,
             depth: Int = Depth, width: Int = Width): DataFrame = {
    val jb = explode(array((0 until depth).map(j =>
      struct(lit(j).as("j"), bucket(j, col(tokCol), width).as("b"))): _*)).as("jb")
    toks.select(jb)
      .groupBy(col("jb.j").as("j"), col("jb.b").as("b"))
      .agg(count(lit(1)).as("c"))
  }

  /** Point estimates for a probe-token table: min over the Depth cells
    * each probe hashes to. The sketch is ≤1024 rows → broadcast; at
    * 100 TB the probes stream against it with no shuffle of their own
    * beyond the probe table's.
    */
  /** Join-size estimate via the sketch inner product (Cormode &
    * Muthukrishnan §4.2): |A ⋈ B on k| = Σ_k cA(k)·cB(k), estimated as
    * min_j Σ_b cmA[j][b]·cmB[j][b] — one-sided (≥ true; collisions only
    * add) with additive error ≤ |A|·|B|/width per row w.h.p. The 100 TB
    * use: bound a join's output BEFORE running it from two KB-sized
    * sketches built in one scan each — no key shuffle anywhere. Returns
    * one row (est over the min of depth rows).
    */
  def joinSizeEstimate(skA: DataFrame, skB: DataFrame): DataFrame =
    skA.select(col("j"), col("b"), col("c").as("ca"))
      .join(skB.select(col("j"), col("b"), col("c").as("cb")), Seq("j", "b"))
      .groupBy("j").agg(sum(col("ca") * col("cb")).as("ip"))
      .agg(min(col("ip")).as("est_join"))

  def estimate(sk: DataFrame, probes: DataFrame, tokCol: String,
               depth: Int = Depth, width: Int = Width): DataFrame = {
    val jb = explode(array((0 until depth).map(j =>
      struct(lit(j).as("j"), bucket(j, col("tok"), width).as("b"))): _*)).as("jb")
    probes.select(col(tokCol).as("tok")).distinct()
      .select(col("tok"), jb)
      .select(col("tok"), col("jb.j").as("j"), col("jb.b").as("b"))
      .join(broadcast(sk), Seq("j", "b"))
      .groupBy("tok")
      .agg(min(col("c")).as("est_cnt"))
  }
}
