package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** P6's canon form in one pass after the lowercase — the compiled
  * replacement for `trim(regexp_replace(lower(c), "\s+", " "))`, which
  * rebuilt every document through the regex engine once per dedup-key
  * computation (the canon runs inside the dedup windows' narrow
  * projection, so it executes per ROW at corpus scale on every exact-
  * and near-dup path).
  *
  * Exactness: lowercase is `UTF8String.toLowerCase` — identical to
  * Spark's `lower` — and java `\s` = [ \t\n\x0B\f\r ] members are
  * single code units that lowercase never produces from non-\s input,
  * so collapsing runs to one space on the lowered string is exactly
  * the regex chain; trim (0x20 only) folds into the same scan by
  * dropping boundary runs. Bit-parity fuzz-pinned in TextOpsSpec; the
  * DuckDB oracles keep replaying the regex form verbatim. NOT
  * null-intolerant: the caller's `coalesce(c, '')` shape is preserved
  * by keeping this kernel strictly the post-lower tail.
  */
case class LowerWsCanon(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lower_ws_canon"

  override protected def nullSafeEval(input: Any): Any =
    LowerWsCanon.kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.LowerWsCanon$$.MODULE$$.kernel($c)")

  override protected def withNewChildInternal(newChild: Expression): LowerWsCanon =
    copy(child = newChild)
}

object LowerWsCanon {

  private object WsAscii extends WsCollapse.WsClass {
    override def is(ch: Char): Boolean =
      ch == ' ' || (ch >= '\t' && ch <= '\r')
  }

  def kernel(u: UTF8String): UTF8String = {
    val lowered = u.toLowerCase
    // shared collapse scan (see WsCollapse in CtrlWsNormalize.scala);
    // canon keeps "" as "" (no nullif in the P6 contract)
    WsCollapse.collapse(lowered, lowered.toString, WsAscii, emptyToNull = false)
  }

  def apply(c: Column): Column =
    GraftSqlBridge.column(LowerWsCanon(GraftSqlBridge.expression(c)))
}
