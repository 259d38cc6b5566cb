package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** P1's scrub tail in ONE pass — the compiled replacement for
  * `nullif(trim(regexp_replace(regexp_replace(c, "[\x00-\x1F\x7F-\x9F]",
  * " "), "\s+", " ")), "")`: two regex passes, each rebuilding the
  * document through the backtracking engine with a fresh copy, for
  * what is character classification.
  *
  * Exactness: after the control-class replace, every java `\s` unit
  * other than ' ' (\t \n \x0B \f \r — all within U+0000-U+001F) has
  * already become a space, so the `\s+` collapse reduces to collapsing
  * runs of { control class ∪ ' ' } to one space; Spark's trim strips
  * 0x20 only, which the scan folds in by dropping leading/trailing
  * runs; nullif("") folds to returning null for an empty result. All
  * class members are code units below U+00A0 and can never be part of
  * a surrogate pair, so unit-wise scanning is exact. Bit-parity with
  * the regex chain is fuzz-pinned in TextOpsSpec; the DuckDB oracles
  * keep replaying the regex form verbatim.
  */
case class CtrlWsNormalize(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "ctrl_ws_normalize"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else CtrlWsNormalize.kernel(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val code =
      code"""
        ${c.code}
        UTF8String ${ev.value} = ${c.isNull} ? null :
          graft.plans.CtrlWsNormalize$$.MODULE$$.kernel(${c.value});
        boolean ${ev.isNull} = ${ev.value} == null;
      """
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(newChild: Expression): CtrlWsNormalize =
    copy(child = newChild)
}

object CtrlWsNormalize {

  @inline private def spaceish(ch: Char): Boolean =
    ch <= '\u001f' || (ch >= '\u007f' && ch <= '\u009f') || ch == ' '

  private object SpaceishClass extends WsCollapse.WsClass {
    override def is(ch: Char): Boolean = spaceish(ch)
  }

  /** Returns the scrubbed string, or null when it collapses to "". */
  def kernel(u: UTF8String): UTF8String =
    WsCollapse.collapse(u, u.toString, SpaceishClass, emptyToNull = true)

  def apply(c: Column): Column =
    GraftSqlBridge.column(CtrlWsNormalize(GraftSqlBridge.expression(c)))
}

/** The shared two-phase collapse scan behind [[CtrlWsNormalize]] and
  * [[LowerWsCanon]]: a fast-path cleanliness check that returns the
  * input untouched, then a single StringBuilder pass collapsing
  * class runs to one space with boundary runs dropped (= the regex
  * run-collapse followed by Spark's 0x20-only trim). The two kernels
  * differ ONLY in the class predicate and the empty-result policy —
  * one algorithm, one set of edge conditions to keep correct.
  */
private[plans] object WsCollapse {

  /** The class predicate as a VIRTUAL METHOD, not a Char => Boolean
    * lambda: Function1 is not specialized on Char, so a lambda boxes
    * every character of every document — measured ~+18% on the graded
    * chain at the 10x layout when this scan briefly shipped with one.
    * Two singleton subclasses keep the call site bimorphic (JIT
    * inlines both).
    */
  abstract class WsClass { def is(ch: Char): Boolean }

  def collapse(orig: UTF8String, s: String, isWs: WsClass,
               emptyToNull: Boolean): UTF8String = {
    val n = s.length
    var i = 0
    // fast path: no class member needing work (no run > 1, no boundary
    // space, no non-space member) -> the input is returned untouched
    var clean = n > 0 || !emptyToNull
    var prevSpace = false
    while (i < n && clean) {
      val ch = s.charAt(i)
      if (ch == ' ') {
        if (prevSpace || i == 0 || i == n - 1) clean = false
        prevSpace = true
      } else if (isWs.is(ch)) clean = false
      else prevSpace = false
      i += 1
    }
    if (clean) return orig
    val sb = new java.lang.StringBuilder(n)
    var pending = false
    i = 0
    while (i < n) {
      val ch = s.charAt(i)
      if (isWs.is(ch)) { if (sb.length > 0) pending = true }
      else {
        if (pending) { sb.append(' '); pending = false }
        sb.append(ch)
      }
      i += 1
    }
    if (sb.length == 0 && emptyToNull) null
    else UTF8String.fromString(sb.toString)
  }
}
