package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word k-shingles as ONE native pass — the kernel under
  * `SketchDedup.shinglesFromTokens`, which feeds the whole sketch-dedup
  * family (MinHash, prefix-Jaccard, containment, n-gram Jaccard,
  * decontamination, source overlap).
  *
  * The declarative form is `array_distinct(transform(sequence(0, n-k),
  * i -> concat_ws(' ', slice(toks, i+1, k))))` — every step interpreted
  * (HOFs are CodegenFallback), with a fresh k-slice array, a boxed
  * lambda frame and a distinct pass per window. This kernel walks the
  * token array once, concatenates each window into one UTF8String and
  * dedups through a LinkedHashSet, preserving the HOF form's
  * first-occurrence order exactly (parity-pinned in SketchDedupSpec).
  *
  * Semantics matched to the HOF form:
  *  - n ≥ k: distinct windows of k tokens joined by one space
  *  - 0 < n < k: the whole token array joined as a single shingle
  *  - n = 0: empty array
  *  - null tokens inside a window are skipped (concat_ws parity)
  */
case class WordShinglesK(child: Expression, k: Int)
    extends UnaryExpression {

  require(k > 0, s"shingle size must be positive: $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    WordShinglesK.kernel(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.WordShinglesK$$.MODULE$$.kernel($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): WordShinglesK =
    copy(child = newChild)
}

object WordShinglesK {

  private val Space = UTF8String.fromString(" ")

  private def joinWindow(toks: ArrayData, from: Int, len: Int): UTF8String = {
    val parts = new Array[UTF8String](len)
    var d = 0
    while (d < len) {
      // nulls stay null in the parts array: concatWs skips them,
      // matching concat_ws
      if (!toks.isNullAt(from + d)) parts(d) = toks.getUTF8String(from + d)
      d += 1
    }
    UTF8String.concatWs(Space, parts: _*)
  }

  /** Static kernel shared by interpreted eval and generated code. */
  def kernel(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    if (n < k) {
      return new GenericArrayData(Array[Any](joinWindow(toks, 0, n)))
    }
    val seen = new java.util.LinkedHashSet[UTF8String]((n - k + 1) * 2)
    var i = 0
    while (i <= n - k) {
      seen.add(joinWindow(toks, i, k))
      i += 1
    }
    val out = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  /** Column-API entry point over a string-array column. */
  def apply(toks: Column, k: Int): Column =
    GraftSqlBridge.column(WordShinglesK(GraftSqlBridge.expression(toks), k))
}
