package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** AMS / tug-of-war sketch for the second frequency moment
  * (Alon–Matias–Szegedy, STOC '96 — public literature): estimate
  * F2 = Σ_t count(t)² — the SELF-JOIN SIZE of a key column, the number
  * join planners and skew detectors actually need ("how big does this
  * key's self-join get?") — in O(k) counters instead of a
  * vocabulary-wide groupBy. Each estimator j keeps one running sum
  * S_j = Σ_occurrences sign_j(token) with a ±1 hash per token;
  * E[S_j²] = F2 exactly, and the median over k estimators concentrates.
  * The k sums are plain SUMs, so the aggregate partial-combines
  * map-side with k longs of state and merges across shards by
  * addition — same 100 TB shape as CountMin.
  *
  * Determinism: sign_j(t) = +1 iff the first hex digit of
  * md5("j:" ++ t) is even — seedless and portable, so the per-estimator
  * sums, their squares, the even-k lower-median, AND the exact F2 it is
  * checked against are all exact integers both engines replay.
  */
object Ams {

  val K = 8

  /** ±1 as a Column: parity of the first md5 hex digit of "j:" ++ tok
    * (fused [[graft.plans.Md5PrefixLong]] kernel — bit-identical to the
    * conv/substring/md5 form the oracle replays).
    */
  def sign(j: Int, tok: Column): Column =
    (graft.plans.Md5PrefixLong(tok, j + ":", 1) % 2) * 2 - 1

  /** Per-group AMS state: one row per group with s0..s(K-1). */
  def sketch(df: DataFrame, groupCol: String, tokCol: String): DataFrame =
    df.groupBy(groupCol)
      .agg(sum(sign(0, col(tokCol))).as("s0"),
        (1 until K).map(j => sum(sign(j, col(tokCol))).as(s"s$j")): _*)

  /** F2 point estimate from the K sums: lower median (the (K/2)-th of
    * the K sorted squares — deterministic for even K without averaging)
    * so both engines land on the identical integer.
    */
  def estimateF2(sk: DataFrame): DataFrame = {
    val squares = array((0 until K).map(j => col(s"s$j") * col(s"s$j")): _*)
    sk.withColumn("est_f2", element_at(array_sort(squares), K / 2))
  }
}
