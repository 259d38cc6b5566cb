package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Unit-L2-normalize a double array as a native expression — the
  * staging step of every [[graft.ops.Pq]] scan. The HOF form it
  * replaces (`when(sqrt(aggregate(...)) > 0, transform(v, x / norm))`)
  * re-evaluates the full norm fold **per element** (the `norm` subtree
  * is copied into the divide lambda), measured ~350 µs/row at d=64 —
  * this kernel folds once and divides in place (µs/row).
  *
  * Float parity with the HOF form and the oracle's
  * `list_transform(v, x -> x / sqrt(list_reduce(...)))`: the norm is
  * `sqrt` of the left-to-right `Σ x²` fold seeded at 0.0 (exact:
  * 0+x = x), each element divides by that one double, and the zero
  * vector (norm == 0, e.g. all-zero embeddings) passes through
  * unscaled. Same IEEE ops in the same order ⇒ bit-identical output,
  * so the PQ queries keep their DuckDB oracles. Elements are assumed
  * non-null (cast corpus vectors), like the fold it replaces.
  */
case class L2Normalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "l2_normalize"

  override protected def nullSafeEval(v: Any): Any =
    L2Normalize.kernel(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.plans.L2Normalize$$.MODULE$$.kernel($v)")

  override protected def withNewChildInternal(newChild: Expression): L2Normalize =
    copy(child = newChild)
}

object L2Normalize {

  /** Static kernel shared by interpreted eval and generated code. */
  def kernel(v: ArrayData): ArrayData = {
    val n = v.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = v.getDouble(i)
      s += x * x
      i += 1
    }
    val norm = math.sqrt(s)
    val out = new Array[Double](n)
    i = 0
    if (norm > 0) {
      while (i < n) { out(i) = v.getDouble(i) / norm; i += 1 }
    } else {
      while (i < n) { out(i) = v.getDouble(i); i += 1 }
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point over array<double>. */
  def apply(v: Column): Column =
    GraftSqlBridge.column(L2Normalize(GraftSqlBridge.expression(v)))
}
