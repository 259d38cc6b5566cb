package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded per-group top-k as a typed `Aggregator` (SURVEY.md §2.8 O3 at
  * scale; builder brief ANN ranking).
  *
  * Why not `row_number() over (partition by query_id)`: a window moves
  * EVERY candidate row for a query into one partition before ranking —
  * with a handful of queries over a 100 TB corpus that is a handful of
  * tasks each holding the whole corpus. An aggregate ranks the same rows
  * through hash aggregation with map-side partial combine: each task
  * reduces its local candidates to ≤k per query before the shuffle, so
  * the exchange carries O(k · queries · partitions) rows and no
  * single-reducer hotspot exists.
  *
  * Determinism: the total order is (cosine DESC, vec_id ASC) — the same
  * order the window form and the DuckDB oracle use — and ids are unique
  * within a group, so the merged result is independent of partition
  * order and bit-identical to the window form.
  */
object TopK {

  /** One ranked candidate. Field order = the udaf's column order. */
  case class Scored(cosine: Double, vec_id: Long)

  /** Buffer/output wrapper: Product, so `Encoders.product` applies and the
    * buffer stays in Spark's object-hash-aggregate path (no kryo blobs).
    */
  case class Ranked(items: Seq[Scored])

  private val ord: Ordering[Scored] =
    Ordering.by((s: Scored) => (-s.cosine, s.vec_id))

  private class TopKScored(k: Int) extends Aggregator[Scored, Ranked, Ranked] {
    override def zero: Ranked = Ranked(Vector.empty)
    override def reduce(b: Ranked, a: Scored): Ranked =
      // Full buffer and a sorts at-or-after the current worst: O(1) skip
      // (the common case once the buffer warms up).
      if (b.items.length >= k && ord.gteq(a, b.items.last)) b
      else Ranked(((b.items :+ a).sorted(ord)).take(k))
    override def merge(b1: Ranked, b2: Ranked): Ranked =
      Ranked((b1.items ++ b2.items).sorted(ord).take(k))
    override def finish(r: Ranked): Ranked = r
    override def bufferEncoder: Encoder[Ranked] = Encoders.product[Ranked]
    override def outputEncoder: Encoder[Ranked] = Encoders.product[Ranked]
  }

  /** UDAF form: `topK(k)(cosineCol, idCol)` → struct(items: array<struct>). */
  def topK(k: Int) = udaf(new TopKScored(k), Encoders.product[Scored])

  /** Rank candidates (query_id, vec_id, cosine) to the top k per query_id,
    * emitting (query_id, vec_id, cosine, rank) with rank 1..k — the exact
    * output shape of the window formulation, without its shuffle shape.
    */
  def perQuery(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy("query_id")
      .agg(topK(k)(col("cosine"), col("vec_id")).as("topk"))
      .select(col("query_id"), posexplode(col("topk.items")))
      .select(col("query_id"), col("col.vec_id").as("vec_id"),
        col("col.cosine").as("cosine"), (col("pos") + 1).cast("long").as("rank"))

  // ---- payload-carrying variant -----------------------------------------

  /** [[Scored]] plus two opaque long payload slots that ride through the
    * heap untouched. Ordering ignores them, so rankings are bit-identical
    * to [[perQuery]] on the same (cosine, vec_id) — but a caller that
    * needs per-candidate detail after ranking (rrfFuse's per-modality
    * ranks) gets it without re-joining the pre-ranking frame, which
    * otherwise forces a persist + second traversal of the whole upstream
    * pipeline.
    */
  case class ScoredP(cosine: Double, vec_id: Long, p1: Long, p2: Long)
  case class RankedP(items: Seq[ScoredP])

  private val ordP: Ordering[ScoredP] =
    Ordering.by((s: ScoredP) => (-s.cosine, s.vec_id))

  private class TopKScoredP(k: Int) extends Aggregator[ScoredP, RankedP, RankedP] {
    override def zero: RankedP = RankedP(Vector.empty)
    override def reduce(b: RankedP, a: ScoredP): RankedP =
      if (b.items.length >= k && ordP.gteq(a, b.items.last)) b
      else RankedP(((b.items :+ a).sorted(ordP)).take(k))
    override def merge(b1: RankedP, b2: RankedP): RankedP =
      RankedP((b1.items ++ b2.items).sorted(ordP).take(k))
    override def finish(r: RankedP): RankedP = r
    override def bufferEncoder: Encoder[RankedP] = Encoders.product[RankedP]
    override def outputEncoder: Encoder[RankedP] = Encoders.product[RankedP]
  }

  def topKPayload(k: Int) = udaf(new TopKScoredP(k), Encoders.product[ScoredP])

  /** [[perQuery]] with two payload columns `p1`, `p2` carried through:
    * input (query_id, vec_id, cosine, p1, p2) → output adds rank 1..k.
    */
  def perQueryPayload(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy("query_id")
      .agg(topKPayload(k)(col("cosine"), col("vec_id"),
        col("p1"), col("p2")).as("topk"))
      .select(col("query_id"), posexplode(col("topk.items")))
      .select(col("query_id"), col("col.vec_id").as("vec_id"),
        col("col.cosine").as("cosine"), (col("pos") + 1).cast("long").as("rank"),
        col("col.p1").as("p1"), col("col.p2").as("p2"))
}
