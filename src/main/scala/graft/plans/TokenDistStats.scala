package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass token-distribution statistics: `[entropy, max_freq_ratio]`
  * from a token array — the compiled replacement for the two
  * interpreted higher-order chains in TextMetrics
  * (`aggregate(transform(array_sort(array_distinct(t)), x ->
  * size(filter(t, y = x))...)` and its array_max sibling).
  *
  * Why a kernel, beyond the repo's usual ~10× interpreted-HOF tax:
  * those chains are O(distinct·n) PER ROW — the inner `filter` rescans
  * the whole token array once per distinct token. On ordinary prose
  * (distinct ≪ n) that hides; on a poisoned row it is the same
  * stall-one-executor-core class as the email regex was: a 150k-token
  * line of UNIQUE tokens (a dictionary dump, an id column pasted into
  * text) costs ~2·10¹⁰ interpreted comparisons — minutes for one row.
  * This kernel sorts once and run-length-counts: O(n log n),
  * milliseconds on the same row (HostileInputSpec pins it).
  *
  * Bit-exactness contract (the oracle quantizes at 1e-4, but the
  * kernel is pinned bit-equal to the HOF form it replaces, which is
  * stricter): counts fold as `acc + c * log(c)` over distinct tokens
  * in ASCENDING BINARY order — java.util.Arrays.sort over UTF8String
  * reproduces `array_sort`'s byte-wise ordering exactly, the run pass
  * visits runs in that order, and `log` is the same function Spark's
  * `log` expression evaluates (StrictMath.log; TokenDistStatsSpec's
  * random-parity test would catch a ulp divergence). entropy =
  * log(n) − acc/n; max_freq_ratio = maxCount/n (int max —
  * order-free). Empty array → [0.0, 0.0], matching the `when(size>0)`
  * guards it replaces.
  */
case class TokenDistStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_dist_stats"

  override protected def nullSafeEval(input: Any): Any =
    TokenDistStats.stats(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.TokenDistStats$$.MODULE$$.stats($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenDistStats =
    copy(child = newChild)
}

object TokenDistStats {

  def stats(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array(0.0, 0.0))
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      toks(i) = arr.getUTF8String(i) // tokens() never yields null elements
      i += 1
    }
    java.util.Arrays.sort(toks, null) // natural order = byte-wise, = array_sort
    var acc = 0.0
    var maxCount = 0
    var runStart = 0
    i = 1
    while (i <= n) {
      if (i == n || toks(i).compareTo(toks(runStart)) != 0) {
        val c = i - runStart
        if (c > maxCount) maxCount = c
        val cd = c.toDouble
        acc += cd * StrictMath.log(cd)
        runStart = i
      }
      i += 1
    }
    val nd = n.toDouble
    new GenericArrayData(Array(
      StrictMath.log(nd) - acc / nd,
      maxCount.toDouble / nd))
  }

  /** Column-API entry point over a token array column. */
  def apply(toks: Column): Column =
    GraftSqlBridge.column(TokenDistStats(GraftSqlBridge.expression(toks)))

  private[plans] val info = new ExpressionInfo(
    classOf[TokenDistStats].getCanonicalName, null, "token_dist_stats",
    "_FUNC_(arr) - [shannon entropy (nats), max token frequency ratio] of a token array.",
    "", "", "", "array_funcs", "4.0.0", "", "scala_udf")

  private[plans] val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 1, "token_dist_stats expects exactly one argument")
    TokenDistStats(args.head)
  }
}
