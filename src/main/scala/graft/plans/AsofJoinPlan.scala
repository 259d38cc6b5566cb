package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator as-of join (builder-brief custom-operator tier (c):
  * LogicalPlan + SparkStrategy + SparkPlan via SparkSessionExtensions).
  *
  * Semantics (LEFT ASOF BACKWARD, inclusive — DuckDB `ASOF LEFT JOIN
  * ... ON l.k = r.k AND r.t <= l.t`): each left row joins the right row
  * with the greatest time at-or-before its own within the same key, or
  * nulls if none. The composed form ([[graft.ops.AsOfJoin.asofBackward]])
  * expresses this as union + running-`last` window: correct and
  * one-shuffle, but it pays union-width rows through the window state
  * machine and a post-filter that discards the right-side rows it just
  * carried. This operator keeps the same exchange shape (hash on key,
  * sort within partitions) and replaces union+window+filter with a
  * single streaming merge per partition: O(|L|+|R|) with ONE buffered
  * right row, no window frames, no discarded carrier rows.
  *
  * Left rows with a null key or time get null payloads; right rows with
  * a null key or time never match (SQL join-key semantics). Among right
  * rows tied on exactly (key, time), the last one in this side's sort
  * order wins — which specific row that is, is sort-stability-dependent
  * here exactly as it is in the window form (equal sort keys have no
  * defined order in either); tie-free inputs are deterministic in both.
  */
case class AsofJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression)
    extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner rule mapping the logical node to its physical form. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, rk, lt, rt) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

/** Sort-merge as-of join. Requirements declare the distributed contract
  * — both sides clustered on the key (EnsureRequirements co-partitions
  * them) and sorted (key, time) within partitions — so the per-partition
  * algorithm is a forward-only merge: advance the right cursor while it
  * is at-or-before the current left row, remembering the latest same-key
  * row as the candidate. Right rows are copied only when they become the
  * candidate (execute() iterators reuse row buffers).
  */
case class AsofJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
          SortOrder(leftTime, org.apache.spark.sql.catalyst.expressions.Ascending)),
        Seq(SortOrder(rightKey, org.apache.spark.sql.catalyst.expressions.Ascending),
          SortOrder(rightTime, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  protected override def doExecute(): RDD[InternalRow] = {
    val lkB = BindReferences.bindReference(leftKey, left.output)
    val ltB = BindReferences.bindReference(leftTime, left.output)
    val rkB = BindReferences.bindReference(rightKey, right.output)
    val rtB = BindReferences.bindReference(rightTime, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val nRightFields = right.output.size
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(nRightFields)
      // right cursor: next unconsumed right row with non-null key+time
      var rHead: InternalRow = null
      var rHeadKey: Any = null
      var rHeadTime: Any = null
      def advanceRight(): Unit = {
        rHead = null
        while (rHead == null && rIter.hasNext) {
          val r = rIter.next()
          val k = rkB.eval(r)
          val t = rtB.eval(r)
          if (k != null && t != null) { rHead = r; rHeadKey = k; rHeadTime = t }
        }
      }
      advanceRight()
      // latest right row already passed whose key may match the current
      // left key (candKey is evaluated on the COPY, so it stays stable)
      var cand: InternalRow = null
      var candKey: Any = null
      lIter.map { l =>
        val lk = lkB.eval(l)
        val lt = ltB.eval(l)
        if (lk == null || lt == null) proj(joined(l, nullRight))
        else {
          var scanning = rHead != null
          while (scanning) {
            val c = keyOrd.compare(rHeadKey, lk)
            if (c < 0) {
              cand = null // right key fell behind: stale candidate dies
              advanceRight()
              scanning = rHead != null
            } else if (c == 0 && timeOrd.compare(rHeadTime, lt) <= 0) {
              cand = rHead.copy()
              candKey = rkB.eval(cand)
              advanceRight()
              scanning = rHead != null
            } else scanning = false
          }
          if (cand != null && keyOrd.compare(candKey, lk) == 0)
            proj(joined(l, cand))
          else proj(joined(l, nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}
