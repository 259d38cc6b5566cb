package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** md5 MinHash signature as ONE native pass — the hot kernel under
  * [[graft.ops.SketchDedup.minhashMd5Pairs]].
  *
  * Slot j of the signature is the minimum md5 over the shingle set,
  * seeded by prefixing `"j:"` to the shingle bytes. Minimization runs
  * on the raw 16-byte digests with unsigned byte compare — identical
  * to lexicographic order on the lowercase hex (nibble→hex-digit
  * mapping is monotone in ASCII) — and only the per-slot winners are
  * hex-encoded. The declarative HOF form (`transform(sequence(0,n-1),
  * j -> array_min(transform(sh, md5(concat(...)))))`)
  * computes the same numHashes·|sh| md5 calls interpreted with boxed
  * string building per call: measured 7.2s vs sub-second at sf0.1.
  * Parity-pinned in SketchSpec.
  *
  * Null shingles are skipped (array_min ignores nulls); an empty or
  * all-null shingle set yields NULL, like array_min of nothing.
  */
case class MinhashMd5(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes > 0, s"numHashes must be positive: $numHashes")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_md5"

  override protected def nullSafeEval(input: Any): Any =
    MinhashMd5.kernel(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.plans.MinhashMd5$$.MODULE$$.kernel($c, $numHashes);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override def nullable: Boolean = true

  override protected def withNewChildInternal(newChild: Expression): MinhashMd5 =
    copy(child = newChild)
}

object MinhashMd5 {

  /** "j:" prefixes, cached per numHashes (tiny, computed once). */
  private val prefixCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Byte]]]()

  private def prefixes(n: Int): Array[Array[Byte]] =
    prefixCache.computeIfAbsent(n, m =>
      Array.tabulate(m)(j => s"$j:".getBytes("UTF-8")))

  /** Thread-local 16-byte digest output, reused across every
    * (slot, shingle) call: the previous `d.digest(s)` allocated a fresh
    * 16-byte array per call — numHashes·|sh| short-lived allocations per
    * row (24M for q_incr_neardup's two sketch tables at sf0.1) for
    * digests that lose the running-min compare almost always. Winners
    * (O(log |sh|) expected per slot) are copied out; everything else
    * never escapes the scratch buffer. Same digests, same minima.
    */
  private val scratch = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](16)
  }

  /** Static kernel shared by interpreted eval and generated code.
    * Returns null when no non-null shingle exists (array_min parity).
    */
  def kernel(sh: ArrayData, numHashes: Int): ArrayData = {
    val pre = prefixes(numHashes)
    val mins = new Array[Array[Byte]](numHashes)
    val buf = scratch.get()
    val n = sh.numElements()
    var i = 0
    while (i < n) {
      if (!sh.isNullAt(i)) {
        val s = sh.getUTF8String(i).getBytes
        var j = 0
        while (j < numHashes) {
          val d = Md5Hex.digest()
          d.update(pre(j))
          d.update(s)
          d.digest(buf, 0, 16)
          if (mins(j) == null) mins(j) = java.util.Arrays.copyOf(buf, 16)
          else if (java.util.Arrays.compareUnsigned(buf, mins(j)) < 0)
            System.arraycopy(buf, 0, mins(j), 0, 16)
          j += 1
        }
      }
      i += 1
    }
    if (mins(0) == null) return null
    val out = new Array[AnyRef](numHashes)
    var j = 0
    while (j < numHashes) {
      out(j) = UTF8String.fromString(Md5Hex.hex(mins(j)))
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point over a string-array column. */
  def apply(sh: Column, numHashes: Int): Column =
    GraftSqlBridge.column(MinhashMd5(GraftSqlBridge.expression(sh), numHashes))
}
