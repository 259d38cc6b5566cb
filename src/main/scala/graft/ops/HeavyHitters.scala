package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra–Gries heavy-hitters summary (Misra & Gries '82; merge rule per
  * Agarwal, Cormode, Huang, Phillips, Wei, Yi — "Mergeable Summaries",
  * PODS'12 — public literature). The frequent-items member of the
  * sketch family next to HLL/KMV (distincts), Count-Min (point
  * frequency of a KNOWN probe), DDSketch (quantiles) and AMS (F2): the
  * "what dominates this crawl?" question [[Report.topValues]] answers
  * only via a vocabulary-wide groupBy, answered here in k counters of
  * bounded state that partial-aggregate map-side and merge across
  * shards.
  *
  * Guarantees (the oracle-checkable contract — see q_heavy_hitters):
  * for a stream of n items summarized with k counters, under ANY
  * partitioning / merge order,
  *
  *   - no overcount:       est(x) ≤ true(x) for every retained x
  *   - bounded undercount: true(x) − est(x) ≤ (n − R) / (k+1) ≤ n/(k+1)
  *                         (R = total weight remaining in the summary)
  *   - total recall:       every x with true(x) > n/(k+1) is retained
  *
  * The summary CONTENTS are merge-order-sensitive (which of two equal
  * low counters survives a trim depends on association), so the raw
  * form is rows-only; the GUARANTEES are order-proof, so the invariant
  * query is hash-checked: DuckDB computes the heavy set from exact
  * counts and both engines must agree row-for-row that every heavy item
  * was retained within bounds.
  *
  * Scale shape: per-buffer state is ≤ k (tok, count) pairs at every
  * partial-aggregation stage; reduce is amortized O(1) per element
  * (a decrement-all removes k+1 weight, so at most n/(k+1) O(k)
  * rebuilds happen — O(n) total); merge is O(k log k). The input
  * stream is never shuffled on its own key — only ≤ k-entry summaries
  * move.
  */
object HeavyHitters {

  /** One retained counter. `est` never exceeds the item's true count. */
  case class Counter(tok: String, est: Long)

  /** Summary buffer: at most k counters. A Map keeps reduce's
    * hit-increment path O(1); order is irrelevant until [[finish]].
    */
  case class MgState(m: Map[String, Long])

  /** Finished summary, descending by est (ties by tok) so the exploded
    * raw form is display-stable.
    */
  case class MgSummary(items: Seq[Counter])

  private[graft] class MisraGries(k: Int)
      extends Aggregator[String, MgState, MgSummary] {
    require(k >= 1, s"heavy-hitters summary needs k >= 1, got $k")

    override def zero: MgState = MgState(Map.empty)

    // Classic MG step: hit → +1; room → insert at 1; full+miss →
    // decrement ALL by one and drop zeros (the incoming item is
    // consumed by the same decrement). Each full+miss removes k+1
    // total weight (k counters + the uninserted item), so at most
    // n/(k+1) of the O(k) rebuilds ever run.
    override def reduce(b: MgState, a: String): MgState = {
      if (a == null) b
      else {
        val m = b.m
        m.get(a) match {
          case Some(c) => MgState(m.updated(a, c + 1L))
          case None if m.size < k => MgState(m.updated(a, 1L))
          case None =>
            MgState(m.iterator
              .filter(_._2 > 1L)
              .map { case (t, c) => (t, c - 1L) }
              .toMap)
        }
      }
    }

    // Mergeable-summaries rule: add counts pointwise; if more than k
    // counters survive, subtract the (k+1)-th largest count from all
    // and keep the positive remainder. At least k+1 counters lose that
    // full amount, so the weight-per-error invariant
    // (k+1) · maxError ≤ n − R is preserved under ANY merge tree.
    override def merge(b1: MgState, b2: MgState): MgState = {
      if (b2.m.isEmpty) b1
      else if (b1.m.isEmpty) b2
      else {
        val sum = b2.m.foldLeft(b1.m) { case (acc, (t, c)) =>
          acc.updated(t, acc.getOrElse(t, 0L) + c)
        }
        if (sum.size <= k) MgState(sum)
        else {
          val d = sum.valuesIterator.toArray.sorted(Ordering[Long].reverse)(k)
          MgState(sum.iterator
            .filter(_._2 > d)
            .map { case (t, c) => (t, c - d) }
            .toMap)
        }
      }
    }

    override def finish(r: MgState): MgSummary =
      MgSummary(r.m.iterator
        .map { case (t, c) => Counter(t, c) }
        .toSeq
        .sortBy(c => (-c.est, c.tok)))

    override def bufferEncoder: Encoder[MgState] = Encoders.product[MgState]
    override def outputEncoder: Encoder[MgSummary] =
      Encoders.product[MgSummary]
  }

  /** UDAF form: `mgTopK(k)(tokCol)` → struct(items: array<struct<tok,
    * est>>), usable globally or per-group.
    */
  def mgTopK(k: Int) = udaf(new MisraGries(k), Encoders.STRING)

  /** The Agarwal-et-al merge as a TABLE op, for incremental cross-batch
    * state (the frequent-items member of the incremental family next to
    * exact hashes, MinHash band keys, and HLL registers): two (tok, est)
    * summaries union, counts add pointwise, and if more than k counters
    * survive, the (k+1)-th largest is subtracted from all with only the
    * positive remainder kept — exactly [[MisraGries.merge]], so a state
    * folded batch-by-batch carries the same (n−R)/(k+1) guarantees as
    * one flat summary (HeavyHittersSpec pins table-op ≡ aggregator
    * merge). Everything is ≤2k rows: the trim threshold folds from a
    * bounded collect_list, never a window; history is never re-counted —
    * only its k-row summary participates.
    */
  def mergeSummaries(a: org.apache.spark.sql.DataFrame,
                     b: org.apache.spark.sql.DataFrame,
                     k: Int): org.apache.spark.sql.DataFrame = {
    val summed = a.select(col("tok"), col("est"))
      .unionByName(b.select(col("tok"), col("est")))
      .groupBy("tok").agg(sum(col("est")).as("est"))
    // (k+1)-th largest count, 0 when ≤ k counters survive (no trim);
    // the summed table is ≤ 2k rows by construction, so the list fold
    // is bounded and the one-row threshold broadcasts
    // try_element_at: ≤ k surviving counters means no (k+1)-th largest
    // exists — that is the no-trim case, not an ANSI index error
    val d = summed.agg(coalesce(
      try_element_at(reverse(array_sort(collect_list(col("est")))),
        lit(k + 1)),
      lit(0L)).as("d"))
    summed.crossJoin(broadcast(d))
      .filter(col("est") > col("d"))
      .select(col("tok"), (col("est") - col("d")).as("est"))
  }
}
