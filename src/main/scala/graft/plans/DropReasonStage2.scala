package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The fused stage-2 drop-reason ladder (F9–F20, the langRules +
  * qualityRules chain of [[graft.ops.Filters]]) as ONE compact codegen
  * expression.
  *
  * Why this exists: the declarative form is
  * `coalesce(existing, when(p1,r1), …, when(p12,r12))` — twelve
  * CaseWhen branches over the wide profile/metric column set. Under
  * whole-stage codegen the branch bodies are bound-variable code that
  * CANNOT be split into sub-methods (`CaseWhen`/`Coalesce` only split
  * when `ctx.INPUT_ROW` is available), so the generated `processNext()`
  * for the clean-and-filter projection grows past janino's tolerance
  * (`InternalCompilerException` at a ~11k-line method, observed three
  * times per test run in round 11) and Spark silently runs the graded
  * chain's hottest map stage INTERPRETED. This expression collapses
  * the whole ladder into twelve child evals plus one static call, so
  * the projection codegens again at any column width.
  *
  * Bit-parity contract: the first-match-wins result — including the
  * three-valued-logic corners (NULL predicates never fire; `empty_text`
  * fires on NULL text; `pii_heavy` needs BOTH hit counters non-NULL;
  * `isin` over non-null literals is definite once the probe is
  * non-null) — is pinned against the `Filters.applyRules` composition
  * on exhaustive null/threshold fuzz in FiltersDedupSpec. Rule strings,
  * order and thresholds are the operator contract
  * (text_clean_and_filter.py:474-595); only the evaluation engine
  * changes.
  */
case class DropReasonStage2(
    existing: Expression, langPred: Expression, langScore: Expression,
    nonLatinRatio: Expression, text: Expression, nWords: Expression,
    alphaRatio: Expression, repetitionRatio: Expression, url: Expression,
    emailHits: Expression, phoneHits: Expression, toxicity: Expression,
    allowed: Seq[String], minConf: Double, nonLatinThreshold: Double)
  extends Expression {

  override def children: Seq[Expression] = Seq(existing, langPred,
    langScore, nonLatinRatio, text, nWords, alphaRatio, repetitionRatio,
    url, emailHits, phoneHits, toxicity)

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "drop_reason_stage2"

  @transient private lazy val allowedArr: Array[UTF8String] =
    allowed.map(UTF8String.fromString).toArray

  override def eval(input: InternalRow): Any = {
    val ex = existing.eval(input)
    val pred = langPred.eval(input)
    val score = langScore.eval(input)
    val nlr = nonLatinRatio.eval(input)
    val t = text.eval(input)
    val nw = nWords.eval(input)
    val al = alphaRatio.eval(input)
    val rp = repetitionRatio.eval(input)
    val u = url.eval(input)
    val em = emailHits.eval(input)
    val ph = phoneHits.eval(input)
    val tx = toxicity.eval(input)
    DropReasonStage2.reason(
      ex.asInstanceOf[UTF8String],
      pred == null, if (pred == null) null else pred.asInstanceOf[UTF8String],
      score == null, if (score == null) 0.0 else score.asInstanceOf[Double],
      nlr == null, if (nlr == null) 0.0 else nlr.asInstanceOf[Double],
      t.asInstanceOf[UTF8String],
      nw == null, if (nw == null) 0L else nw.asInstanceOf[Long],
      al == null, if (al == null) 0.0 else al.asInstanceOf[Double],
      rp == null, if (rp == null) 0.0 else rp.asInstanceOf[Double],
      u.asInstanceOf[UTF8String],
      em == null, if (em == null) 0L else em.asInstanceOf[Long],
      ph == null, if (ph == null) 0L else ph.asInstanceOf[Long],
      tx == null, if (tx == null) 0.0 else tx.asInstanceOf[Double],
      allowedArr, minConf, nonLatinThreshold)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val Seq(exG, prG, scG, nlG, txtG, nwG, alG, rpG, urG, emG, phG, toG) =
      children.map(_.genCode(ctx))
    val allowedRef = ctx.addReferenceObj("allowedLangs", allowedArr,
      "org.apache.spark.unsafe.types.UTF8String[]")
    def opt(g: ExprCode) = s"${g.isNull} ? null : ${g.value}"
    val code =
      code"""
        ${exG.code}
        ${prG.code}
        ${scG.code}
        ${nlG.code}
        ${txtG.code}
        ${nwG.code}
        ${alG.code}
        ${rpG.code}
        ${urG.code}
        ${emG.code}
        ${phG.code}
        ${toG.code}
        UTF8String ${ev.value} = graft.plans.DropReasonStage2$$.MODULE$$.reason(
          ${opt(exG)},
          ${prG.isNull}, ${opt(prG)},
          ${scG.isNull}, ${scG.value},
          ${nlG.isNull}, ${nlG.value},
          ${opt(txtG)},
          ${nwG.isNull}, ${nwG.value},
          ${alG.isNull}, ${alG.value},
          ${rpG.isNull}, ${rpG.value},
          ${opt(urG)},
          ${emG.isNull}, ${emG.value},
          ${phG.isNull}, ${phG.value},
          ${toG.isNull}, ${toG.value},
          $allowedRef, $minConf, $nonLatinThreshold);
        boolean ${ev.isNull} = ${ev.value} == null;
      """
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DropReasonStage2 =
    copy(existing = newChildren(0), langPred = newChildren(1),
      langScore = newChildren(2), nonLatinRatio = newChildren(3),
      text = newChildren(4), nWords = newChildren(5),
      alphaRatio = newChildren(6), repetitionRatio = newChildren(7),
      url = newChildren(8), emailHits = newChildren(9),
      phoneHits = newChildren(10), toxicity = newChildren(11))
}

object DropReasonStage2 {

  private val LangUnknown = UTF8String.fromString("lang_unknown")
  private val NonEnglish = UTF8String.fromString("non_english")
  private val LowLangConfidence = UTF8String.fromString("low_lang_confidence")
  private val NonLatinHeavy = UTF8String.fromString("non_latin_heavy")
  private val EmptyText = UTF8String.fromString("empty_text")
  private val TooShort = UTF8String.fromString("too_short")
  private val TooLong = UTF8String.fromString("too_long")
  private val LowAlphaRatio = UTF8String.fromString("low_alpha_ratio")
  private val HighRepetition = UTF8String.fromString("high_repetition")
  private val BlockedUrl = UTF8String.fromString("blocked_url")
  private val PiiHeavy = UTF8String.fromString("pii_heavy")
  private val HighToxicity = UTF8String.fromString("high_toxicity")
  private val Unk = UTF8String.fromString("unk")
  // ONE source of truth with Filters.qualityRules: thresholds and the
  // blocked-URL literals come from the named contract constants
  private val BlockedLits: Array[UTF8String] =
    graft.ops.Filters.BlockedUrlLiterals.map(UTF8String.fromString).toArray
  private val MinWords = graft.ops.Filters.QualityMinWords
  private val MaxWords = graft.ops.Filters.QualityMaxWords
  private val MinAlpha = graft.ops.Filters.QualityMinAlphaRatio
  private val MaxRep = graft.ops.Filters.QualityMaxRepetition
  private val MaxPii = graft.ops.Filters.QualityMaxPiiHits
  private val MaxTox = graft.ops.Filters.QualityMaxToxicity

  @inline private def isIn(p: UTF8String, arr: Array[UTF8String]): Boolean = {
    var i = 0
    while (i < arr.length) { if (arr(i).equals(p)) return true; i += 1 }
    false
  }

  /** Static kernel shared by interpreted eval and generated code.
    * Boolean+primitive pairs instead of boxed args: zero allocation on
    * the non-firing path (the overwhelmingly common one).
    */
  def reason(existing: UTF8String,
             predNull: Boolean, pred: UTF8String,
             scoreNull: Boolean, score: Double,
             nlrNull: Boolean, nlr: Double,
             text: UTF8String,
             nWordsNull: Boolean, nWords: Long,
             alphaNull: Boolean, alpha: Double,
             repNull: Boolean, rep: Double,
             url: UTF8String,
             emailNull: Boolean, email: Long,
             phoneNull: Boolean, phone: Long,
             toxNull: Boolean, tox: Double,
             allowed: Array[UTF8String], minConf: Double,
             nlThr: Double): UTF8String = {
    if (existing != null) return existing
    // F9–F12 (langRules)
    if (!predNull && pred.equals(Unk)) return LangUnknown
    if (!predNull && !isIn(pred, allowed) && !pred.equals(Unk)) return NonEnglish
    if (!predNull && isIn(pred, allowed) && !scoreNull && score < minConf)
      return LowLangConfidence
    if (!nlrNull && nlr > nlThr) return NonLatinHeavy
    // F13–F20 (qualityRules)
    if (text == null || text.trim().numBytes() == 0) return EmptyText
    if (!nWordsNull && nWords < MinWords) return TooShort
    if (!nWordsNull && nWords > MaxWords) return TooLong
    if (!alphaNull && alpha < MinAlpha) return LowAlphaRatio
    if (!repNull && rep > MaxRep) return HighRepetition
    // the blocked-URL alternation under find() is exactly a
    // multi-literal contains (over coalesce(url, ''))
    if (url != null) {
      var j = 0
      while (j < BlockedLits.length) {
        if (url.contains(BlockedLits(j))) return BlockedUrl
        j += 1
      }
    }
    if (!emailNull && !phoneNull && email + phone > MaxPii) return PiiHeavy
    if (!toxNull && tox >= MaxTox) return HighToxicity
    null
  }

  def apply(existing: Column, langPred: Column, langScore: Column,
            nonLatinRatio: Column, text: Column, nWords: Column,
            alphaRatio: Column, repetitionRatio: Column, url: Column,
            emailHits: Column, phoneHits: Column, toxicity: Column,
            allowed: Seq[String], minConf: Double,
            nonLatinThreshold: Double): Column =
    GraftSqlBridge.column(DropReasonStage2(
      GraftSqlBridge.expression(existing), GraftSqlBridge.expression(langPred),
      GraftSqlBridge.expression(langScore),
      GraftSqlBridge.expression(nonLatinRatio),
      GraftSqlBridge.expression(text), GraftSqlBridge.expression(nWords),
      GraftSqlBridge.expression(alphaRatio),
      GraftSqlBridge.expression(repetitionRatio),
      GraftSqlBridge.expression(url), GraftSqlBridge.expression(emailHits),
      GraftSqlBridge.expression(phoneHits), GraftSqlBridge.expression(toxicity),
      allowed, minConf, nonLatinThreshold))
}
