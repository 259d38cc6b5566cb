package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Feature-hashed signed-count text vector as ONE native codegen'd
  * pass — the hot kernel under [[graft.ops.HashedEmbed]].
  *
  * The declarative form (md5 per token via `transform`, then an
  * `aggregate` fold rebuilding a dim-slot array accumulator per token)
  * is interpreted — higher-order lambdas are CodegenFallback and the
  * per-token `transform(acc, ...)` allocates and walks a fresh
  * dim-array each step: O(dim·tokens) interpreted ops and allocations
  * per row. This kernel keeps one primitive double[dim] accumulator
  * and reads only the md5 digest's first two BYTES per token — hex
  * chars 1-2 are exactly byte 0 (unsigned) and hex char 3 is byte 1's
  * high nibble, so `bucket = b0 % dim`, `sign = ±1 from b1>>4 parity`
  * — value-identical to the HOF form and to the DuckDB oracle's
  * hex-substring parse (parity-pinned in SimilaritySpec).
  *
  * Null tokens contribute nothing (the HOF chain nulls them through
  * `when` into the 0.0 branch).
  */
case class HashedSignedCount(child: Expression, dim: Int)
    extends UnaryExpression {

  require(dim > 0 && dim <= 256,
    s"dim must be in (0, 256] (bucket reads one digest byte): $dim")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hashed_signed_count"

  override protected def nullSafeEval(input: Any): Any =
    HashedSignedCount.kernel(input.asInstanceOf[ArrayData], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.HashedSignedCount$$.MODULE$$.kernel($c, $dim)")

  override protected def withNewChildInternal(newChild: Expression): HashedSignedCount =
    copy(child = newChild)
}

object HashedSignedCount {

  /** Static kernel shared by interpreted eval and generated code. */
  def kernel(toks: ArrayData, dim: Int): ArrayData = {
    val acc = new Array[Double](dim)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val d = Md5Hex.digest()
          .digest(toks.getUTF8String(i).getBytes)
        val bucket = (d(0) & 0xff) % dim
        acc(bucket) += (if (((d(1) >> 4) & 1) == 0) 1.0 else -1.0)
      }
      i += 1
    }
    new GenericArrayData(acc)
  }

  /** Column-API entry point over a string-array column. */
  def apply(toks: Column, dim: Int): Column =
    GraftSqlBridge.column(
      HashedSignedCount(GraftSqlBridge.expression(toks), dim))
}
