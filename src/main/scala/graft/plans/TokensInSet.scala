package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Keep the elements of a token array that belong to a dynamic word
  * set, preserving order and DUPLICATES — the compiled replacement for
  * `filter(toks, t => t.isin(words: _*))`, whose lambda is interpreted
  * per element (a fresh frame and a linear isin scan per token — the
  * usual ~10× HOF tax, paid corpus-wide in BM25's query-term hit
  * extraction). Duplicates must survive because the downstream
  * aggregate counts term frequency; that rules out `array_intersect`,
  * which dedups.
  *
  * The set rides along as a plain JVM object (same pattern as
  * [[PqCodes]]' codebook): reference data for the kernel, never
  * Catalyst-evaluated, so the plan node stays opaque-small regardless
  * of vocabulary size, and membership is a hash probe instead of a
  * linear isin.
  *
  * Value parity with the HOF form it replaces: UTF8String equality is
  * byte equality, exactly what `isin`'s binary string comparison does;
  * order/duplicates pass through untouched; null ELEMENTS (impossible
  * from tokens(), possible from raw SQL arrays) are dropped, matching
  * `isin`'s null-propagating lambda which filter treats as
  * don't-keep.
  */
// words is a Seq (NOT Array): case-class equality on Array is
// reference-based, which would defeat Catalyst semanticEquals — two
// identical TokensInSet calls would never CSE or cache-match
case class TokensInSet(child: Expression, words: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "tokens_in_set"

  @transient private lazy val set = TokensInSet.buildSet(words)

  override protected def nullSafeEval(input: Any): Any =
    TokensInSet.kernel(input.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("tokenSet", set,
      "java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>")
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.TokensInSet$$.MODULE$$.kernel($c, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): TokensInSet =
    copy(child = newChild)
}

object TokensInSet {

  private[plans] def buildSet(words: Seq[String]): java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.length * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  def kernel(arr: ArrayData, set: java.util.HashSet[UTF8String]): ArrayData = {
    val n = arr.numElements()
    val out = new Array[UTF8String](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        if (set.contains(t)) { out(m) = t; m += 1 }
      }
      i += 1
    }
    if (m == n) new GenericArrayData(out)
    else new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }

  /** Column-API entry point. */
  def apply(toks: Column, words: Seq[String]): Column =
    GraftSqlBridge.column(
      TokensInSet(GraftSqlBridge.expression(toks), words))
}
