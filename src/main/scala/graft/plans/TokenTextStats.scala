package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass tokenize-and-count over the RAW STRING:
  * `[token_count, distinct_count, stopword_count, max_token_count]` —
  * the compiled replacement for `size(split(trim(c), "\\s+"))`
  * (word_count / n_words), `TokenSetStats(split(trim(c), "\\s+"), …)`
  * (repetition_ratio) and the max-frequency half of
  * `TokenDistStats(tokens(c))` in the hot scalar pipeline. The split
  * form builds a full UTF8String ARRAY per row (one object + one copy
  * per token, via a regex engine) just so downstream counters can walk
  * it once and throw it away; this kernel walks the string's bytes
  * directly — zero token array, zero regex — and was measured the
  * largest remaining slice of the graded pipeline's clean+filter
  * stage after the r10 kernels (ratio sub-stage, SCALING.md). The
  * fourth element (count of the most frequent token; 0 for the empty
  * string) lets deepCleanAndPii's `withTokenStats` derive
  * `max_token_freq_ratio` without staging a token array at all:
  * `max_count/n` over exact integers divides bit-identically to
  * TokenDistStats' in-kernel `maxCount.toDouble / nd` (KernelFuzzSpec
  * pins the bits).
  *
  * Bit-exactness contract (counts are integers, so parity is
  * equality with the split forms, spec-pinned in TextOpsSpec):
  *  - trim is Spark's `trim()`: ASCII space (0x20) only, both ends.
  *  - the separator is Java regex `\s+` WITHOUT UNICODE_CHARACTER_CLASS:
  *    runs of [space \t \n \x0B \f \r] — all ASCII, so the walk is
  *    byte-level-safe in UTF-8 (continuation bytes have the high bit
  *    set and can never alias a separator).
  *  - Spark's split uses limit -1: a separator run at the string START
  *    yields a leading "" token and one at the END yields a trailing
  *    "" token (verified against Pattern.split(s, -1)); both count in
  *    token_count, "" counts once in distinct_count, and "" is never a
  *    stopword.
  *  - the empty-after-trim string maps to the empty ARRAY (the
  *    `when(c.isNull || trim(c) === "", array())` guard in
  *    TextMetrics.tokens), i.e. [0, 0, 0] — NOT Java split's [""].
  *  - distinct is byte equality (= array_distinct), stopwords match on
  *    UTF8String.toLowerCase (= the `array_contains(stops, lower(tok))`
  *    lambda), exactly the [[TokenSetStats]] contract.
  * Null in → null out (nullIntolerant); callers keep their
  * `coalesce`/`when` guards.
  */
// words is a Seq (NOT Array): case-class equality on Array is
// reference-based, which would defeat Catalyst semanticEquals (the
// TokensInSet precedent)
case class TokenTextStats(child: Expression, words: Seq[String])
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_text_stats"

  @transient private lazy val set = TokensInSet.buildSet(words)

  override protected def nullSafeEval(input: Any): Any =
    TokenTextStats.stats(input.asInstanceOf[UTF8String], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("stopSet", set,
      "java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>")
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.TokenTextStats$$.MODULE$$.stats($c, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenTextStats =
    copy(child = newChild)
}

object TokenTextStats {

  private def isSep(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  def stats(s: UTF8String,
      stops: java.util.HashSet[UTF8String]): ArrayData = {
    // Spark trim(): strip 0x20 from both ends (other whitespace stays
    // and becomes a separator, yielding the split forms' edge tokens).
    // The scan reads bytes in place (getByte) and tokens are zero-copy
    // views over the row buffer (fromAddress) — both die at return,
    // before the buffer can move.
    val base = s.getBaseObject
    val baseOff = s.getBaseOffset
    var lo = 0
    var hi = s.numBytes
    while (lo < hi && s.getByte(lo) == 0x20) lo += 1
    while (hi > lo && s.getByte(hi - 1) == 0x20) hi -= 1
    if (lo == hi) return new GenericArrayData(Array(0L, 0L, 0L, 0L))
    // HashMap (token -> count) instead of the former HashSet: one map
    // carries distinct (size growth) AND the max-frequency count; small
    // counts box from the Integer cache, so the upgrade is ~free.
    val seen = new java.util.HashMap[UTF8String, Integer](16)
    var nTokens = 0L
    var distinct = 0L
    var stopHits = 0L
    var maxCount = 0L
    def emit(from: Int, until: Int): Unit = {
      nTokens += 1
      val tok = UTF8String.fromAddress(base, baseOff + from, until - from)
      val prev = seen.get(tok)
      val c = if (prev == null) { distinct += 1; 1 } else prev.intValue() + 1
      seen.put(tok, c)
      if (c > maxCount) maxCount = c
      if (!stops.isEmpty && stops.contains(tok.toLowerCase)) stopHits += 1
    }
    var segStart = lo
    var i = lo
    while (i < hi) {
      if (isSep(s.getByte(i))) {
        emit(segStart, i)
        var j = i + 1
        while (j < hi && isSep(s.getByte(j))) j += 1
        segStart = j
        i = j
      } else i += 1
    }
    emit(segStart, hi) // trailing token ("" when the string ends in ws)
    new GenericArrayData(Array(nTokens, distinct, stopHits, maxCount))
  }

  def apply(str: Column, words: Seq[String]): Column =
    GraftSqlBridge.column(
      TokenTextStats(GraftSqlBridge.expression(str), words))

  private[plans] val info = new ExpressionInfo(
    classOf[TokenTextStats].getCanonicalName, null, "token_text_stats",
    "_FUNC_(str) - [token count, distinct token count, stopword count," +
      " max token count] of a whitespace-tokenized string.",
    "", "", "", "string_funcs", "4.0.0", "", "scala_udf")

  private[plans] val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 1, "token_text_stats takes one argument")
    TokenTextStats(args.head, graft.text.TextMetrics.EnStopwords)
  }
}
