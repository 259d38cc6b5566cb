package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Per-group id collection with a hard state bound — the aggregation
  * kernel under document-frequency-gated pair generation
  * ([[SketchDedup.containmentPairs]], [[SketchDedup.winnowOverlapPairs]]).
  *
  * The one-shuffle pair-generation shape — group the posting table by
  * key, keep groups with 2..maxDf members, emit member pairs in-row —
  * needs the group's id list. A plain `collect_list` makes that list
  * UNBOUNDED per-group state: at corpus scale a boilerplate shingle
  * present in millions of documents accumulates millions of ids in one
  * aggregation buffer before the size filter ever runs — the exact
  * OOM-by-skew the df gate exists to prevent. This aggregator stops
  * retaining ids once `cap + 1` are held: enough to prove the group is
  * over the cap (the filter then discards it), never more. Per-buffer
  * state is O(cap) at every partial-aggregation stage, and the shuffle
  * carries ≤ cap+1 ids per group per map task.
  *
  * Determinism: which ids survive in an over-cap buffer depends on
  * arrival order, but every over-cap group is discarded downstream, and
  * under-cap groups always retain ALL their ids — so the post-filter
  * result is arrival-order-independent (the id ORDER within a kept
  * group still varies; consumers must treat the list as a set, as the
  * pair-explode does).
  */
object BoundedCollect {

  /** Buffer/output wrapper (Product ⇒ object-hash-aggregate path). */
  case class Ids(ids: Seq[Long])

  private class BoundedLongList(cap: Int) extends Aggregator[Long, Ids, Ids] {
    override def zero: Ids = Ids(Vector.empty)
    override def reduce(b: Ids, a: Long): Ids =
      if (b.ids.length > cap) b else Ids(b.ids :+ a)
    override def merge(b1: Ids, b2: Ids): Ids =
      if (b1.ids.length > cap) b1
      else Ids((b1.ids ++ b2.ids).take(cap + 1))
    override def finish(r: Ids): Ids = r
    override def bufferEncoder: Encoder[Ids] = Encoders.product[Ids]
    override def outputEncoder: Encoder[Ids] = Encoders.product[Ids]
  }

  /** UDAF form: `longIdsUpTo(cap)(idCol)` → struct(ids: array<bigint>)
    * holding at most cap+1 ids — callers filter `size(...) <= cap` to
    * apply the gate and get the complete list for every kept group.
    */
  def longIdsUpTo(cap: Int) = udaf(new BoundedLongList(cap), Encoders.scalaLong)

  /** String-keyed variant for corpora with non-integral ids. */
  case class SIds(ids: Seq[String])

  private class BoundedStringList(cap: Int)
      extends Aggregator[String, SIds, SIds] {
    override def zero: SIds = SIds(Vector.empty)
    override def reduce(b: SIds, a: String): SIds =
      if (b.ids.length > cap) b else SIds(b.ids :+ a)
    override def merge(b1: SIds, b2: SIds): SIds =
      if (b1.ids.length > cap) b1
      else SIds((b1.ids ++ b2.ids).take(cap + 1))
    override def finish(r: SIds): SIds = r
    override def bufferEncoder: Encoder[SIds] = Encoders.product[SIds]
    override def outputEncoder: Encoder[SIds] = Encoders.product[SIds]
  }

  def stringIdsUpTo(cap: Int) = udaf(new BoundedStringList(cap), Encoders.STRING)

  /** (id-projection cast, bounded collector) for an id column's type:
    * integral ids collect as BIGINT, anything else as STRING — so
    * callers keep their id dtype contract (long out for long ids,
    * string out for string ids).
    */
  def forIdType(dt: org.apache.spark.sql.types.DataType, cap: Int):
      (org.apache.spark.sql.Column => org.apache.spark.sql.Column,
       org.apache.spark.sql.expressions.UserDefinedFunction) = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType | ShortType | IntegerType | LongType =>
        ((c: org.apache.spark.sql.Column) => c.cast("long"), longIdsUpTo(cap))
      case _ =>
        ((c: org.apache.spark.sql.Column) => c.cast("string"), stringIdsUpTo(cap))
    }
  }
}
