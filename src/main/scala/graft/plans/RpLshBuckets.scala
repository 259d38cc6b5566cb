package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Random-hyperplane LSH bucket keys (Charikar, STOC'02) over a double
  * vector — all `tables` keys in one native pass.
  *
  * Bit b of table t is the sign of the dot product with a fixed ±1
  * hyperplane: `sign(Σ_d v[d] · r(t,b,d))`. Collision probability per
  * bit is 1 − θ/π for pairwise angle θ — a property of the ANGLE
  * alone, independent of how the vectors are distributed. That is the
  * property axis-aligned sign bits ([[graft.ops.Similarity.lshBucketAt]])
  * do NOT have: on feature-hashed token-count vectors every document
  * shares the high-count common-token dims, the per-dim signs are
  * nearly constant across the corpus, and the "16-bit" bucket space
  * collapses to a handful of populated buckets — measured at sf0.1:
  * 46 occupied buckets across 8 tables and candidates == ALL pairs
  * (12.5M of 12.5M), i.e. the banding did nothing. Mixing all dims
  * with ±1 weights cancels the shared bias; the bits decorrelate and
  * the bucket histogram flattens (same corpus: ~27k occupied buckets,
  * p99 bucket ≈ 5).
  *
  * Hyperplanes are deterministic and engine-portable: r(t,b,d) = +1
  * if the first hex char of md5("rp_<t>:<b>:<d>") is even, else −1
  * (d is 1-based, matching SQL list indexing — the DuckDB oracle
  * rebuilds the same matrix from the same strings). Components of v
  * are integer-valued by construction (signed token counts), so every
  * partial dot sum is an exact integer in IEEE doubles — the sign is
  * identical in any engine and any summation order.
  *
  * Bucket assembly is the engine's usual MSB-first fold: bucket =
  * Σ_b bit_b << (nbits−1−b), b ascending.
  */
case class RpLshBuckets(child: Expression, tables: Int, nbits: Int)
    extends UnaryExpression {

  require(tables > 0 && nbits > 0 && nbits <= 62,
    s"need 0 < nbits <= 62, tables > 0: tables=$tables nbits=$nbits")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rp_lsh_buckets"

  override protected def nullSafeEval(input: Any): Any =
    RpLshBuckets.kernel(input.asInstanceOf[ArrayData], tables, nbits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.RpLshBuckets$$.MODULE$$.kernel($c, $tables, $nbits)")

  override protected def withNewChildInternal(newChild: Expression): RpLshBuckets =
    copy(child = newChild)
}

object RpLshBuckets {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Double]]()

  /** The flattened hyperplane matrix for (tables, nbits, dim): entry
    * ((t·nbits + b)·dim + d−1) = r(t,b,d) ∈ {−1, +1}. Built once per
    * shape per JVM (executors rebuild it locally — a few thousand md5
    * calls, nothing ships over the wire).
    */
  private[graft] def planes(tables: Int, nbits: Int, dim: Int): Array[Double] =
    cache.computeIfAbsent((tables, nbits, dim), { _ =>
      val r = new Array[Double](tables * nbits * dim)
      var t = 0
      while (t < tables) {
        var b = 0
        while (b < nbits) {
          var d = 1
          while (d <= dim) {
            val dig = Md5Hex.digest()
              .digest(s"rp_$t:$b:$d".getBytes(java.nio.charset.StandardCharsets.UTF_8))
            val firstHex = (dig(0) >> 4) & 0xf
            r(((t * nbits) + b) * dim + (d - 1)) =
              if ((firstHex & 1) == 0) 1.0 else -1.0
            d += 1
          }
          b += 1
        }
        t += 1
      }
      r
    })

  /** Static kernel shared by interpreted eval and generated code. */
  def kernel(v: ArrayData, tables: Int, nbits: Int): ArrayData = {
    val dim = v.numElements()
    val r = planes(tables, nbits, dim)
    val vs = new Array[Double](dim)
    var d = 0
    while (d < dim) { vs(d) = v.getDouble(d); d += 1 }
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var b = 0
      while (b < nbits) {
        val off = ((t * nbits) + b) * dim
        var dot = 0.0
        d = 0
        while (d < dim) { dot += vs(d) * r(off + d); d += 1 }
        bucket = (bucket << 1) + (if (dot > 0) 1L else 0L)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point over a double-array column. */
  def apply(v: Column, tables: Int, nbits: Int): Column =
    GraftSqlBridge.column(
      RpLshBuckets(GraftSqlBridge.expression(v), tables, nbits))
}
