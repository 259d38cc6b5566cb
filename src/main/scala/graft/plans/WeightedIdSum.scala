package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Σ ids[i]·(i+1) (1-based position-weighted id sum) as one native
  * pass — the order-sensitive token-id checksum the graded pipeline
  * twins hash-check (`q_pipeline_graded_full`/`q_pipeline_full_fixed`;
  * the DuckDB oracle's `list_sum(list_transform(ids, (x, i) -> x * i))`
  * with DuckDB's 1-based lambda index).
  *
  * Replaces an `aggregate(input_ids, struct(s, i), ...)` higher-order
  * fold: HOFs are CodegenFallback and the fold allocated a fresh
  * struct per TOKEN — interpreted work × up to 2048 ids per row on the
  * graded chain's stage-6 slice. Exact-equality parity with the HOF
  * form is pinned in TokenizeSpec; overflow semantics are Java Long
  * wraparound, same as the fold's `acc.s + x * (acc.i + 1L)`.
  */
case class WeightedIdSum(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(IntegerType, containsNull = false))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "weighted_id_sum"

  override protected def nullSafeEval(input: Any): Any =
    WeightedIdSum.kernel(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.WeightedIdSum$$.MODULE$$.kernel($c)")

  override protected def withNewChildInternal(newChild: Expression): WeightedIdSum =
    copy(child = newChild)
}

object WeightedIdSum {

  def kernel(ids: ArrayData): Long = {
    val n = ids.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      s += ids.getInt(i).toLong * (i + 1L)
      i += 1
    }
    s
  }

  def apply(c: Column): Column =
    GraftSqlBridge.column(WeightedIdSum(GraftSqlBridge.expression(c)))
}
