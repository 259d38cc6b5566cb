package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** All-m-subspaces PQ encoding as ONE native expression — the argmin
  * kernel of [[graft.ops.Pq]]. The higher-order-function form it
  * replaces (`array_min(transform(codebook, struct(l2sq, code)))`, one
  * column per subspace) is interpreted per element: m·k lambda frames
  * and struct allocations per row, measured ~650 µs/row at
  * m=16, k=10 — this kernel does the same arithmetic in a flat
  * primitive loop inside whole-stage codegen (µs/row).
  *
  * Bit-exactness contract (the DuckDB oracle replays it): per subspace
  * the distance is the left-to-right squared-L2 fold of
  * [[L2SqDistance]] over `v[mi·sub … mi·sub+sub)` (a vector shorter
  * than `dim` folds over the in-bounds prefix, mirroring
  * `slice` + common-prefix zip), and ties pick the smallest code
  * (strict `<` keeps the first winner), matching the
  * `array_min`-over-`struct(dist, code)` ordering and the oracle's
  * `ORDER BY dist, code`. NaN distances cannot occur on finite input
  * (normalization guards the zero vector), so the NaN-ordering corner
  * where `array_min` treats NaN as greatest is unreachable.
  *
  * The codebook rides along as a plain JVM object (per-subspace
  * flattened `k·sub` doubles, ragged k allowed — [[graft.ops.KMeans]]
  * codebooks can lose clusters), not a child `Literal`: it is reference
  * data for the kernel, never Catalyst-evaluated, so the analyzed plan
  * stays one node regardless of m·k·sub.
  */
case class PqCodes(child: Expression, cb: Array[Array[Double]], sub: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_codes"

  override protected def nullSafeEval(v: Any): Any =
    PqCodes.kernel(v.asInstanceOf[ArrayData], cb, sub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cb, "double[][]")
    defineCodeGen(ctx, ev, v =>
      s"graft.plans.PqCodes$$.MODULE$$.kernel($v, $cbRef, $sub)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
}

object PqCodes {

  /** Static kernel shared by interpreted eval and generated code. */
  def kernel(v: ArrayData, cb: Array[Array[Double]], sub: Int): ArrayData = {
    val n = v.numElements()
    val m = cb.length
    val codes = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      val table = cb(mi)
      val k = table.length / sub
      val base = mi * sub
      var bestCode = 0
      var bestDist = 0.0
      var c = 0
      while (c < k) {
        val off = c * sub
        var s = 0.0
        var i = 0
        while (i < sub && base + i < n) {
          val d = v.getDouble(base + i) - table(off + i)
          s += d * d
          i += 1
        }
        if (c == 0 || s < bestDist) { bestDist = s; bestCode = c }
        c += 1
      }
      codes(mi) = bestCode
      mi += 1
    }
    new GenericArrayData(codes)
  }

  /** Column-API entry point: normalized vector → array of m codes. */
  def apply(v: Column, cb: Array[Array[Double]], sub: Int): Column =
    GraftSqlBridge.column(PqCodes(GraftSqlBridge.expression(v), cb, sub))
}
