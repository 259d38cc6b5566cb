package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass language/toxicity signal extraction over the RAW STRING —
  * the compiled replacement for the `lower → regexp_extract_all →
  * WordlistHits` chains behind [[graft.text.LangId.withLangColumns]]
  * and [[graft.text.Toxicity.withToxicityColumns]], which each built a
  * lowered copy AND a token array per row (plus, for lang-ID, a THIRD
  * regex string build for the CJK count). Profiled at the 10× layout
  * the pair was the second-largest slice of the graded pipeline's
  * clean+filter stage after the ratio metrics (SCALING.md).
  *
  * Output by profile:
  *  - `langid`:   [letter_token_count, en_hits, de_hits, es_hits,
  *                 fr_hits, cjk_codepoints]
  *  - `toxicity`: [word_token_count, bad, insult, threat, sexual, slur]
  *
  * Bit-exactness contract (integer counts — parity is equality with
  * the staged forms, spec-pinned):
  *  - lowercase is `UTF8String.toLowerCase` — exactly Spark's `lower`,
  *    applied before tokenization like the staged forms.
  *  - `langid` tokens are maximal runs of `\p{L}` codepoints of the
  *    LOWERED text (= `regexp_extract_all(lower(c), "\\p{L}+")`);
  *    `Character.isLetter` is the same predicate, surrogate pairs
  *    advance once (the [[CharClassStats]] contract).
  *  - `toxicity` tokens are maximal runs of Java `\w` = ASCII
  *    `[a-zA-Z0-9_]` (no UNICODE_CHARACTER_CLASS) of the lowered text.
  *  - `cjk_codepoints` counts codepoints in U+4E00..U+9FFF — exactly
  *    `length(regexp_replace(c, "[^一-鿿]", ""))`; CJK ideographs are
  *    caseless, so counting on the lowered text is identical.
  *  - hits are hashed byte-equality membership against the SAME
  *    wordlists [[WordlistHits]] compiles (lists are lowercase, tokens
  *    already lowered — no per-token re-lowering).
  * Null in → null out (nullIntolerant); callers keep their
  * `coalesce(c, lit(""))` guards.
  */
case class TextProfileStats(child: Expression, profile: String)
  extends UnaryExpression with ExpectsInputTypes {

  require(TextProfileStats.Profiles.contains(profile),
    s"unknown text profile: $profile")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "text_profile_stats"

  @transient private lazy val sets = TextProfileStats.Profiles(profile)
  private val isLang = profile == "langid"

  override protected def nullSafeEval(input: Any): Any =
    TextProfileStats.stats(input.asInstanceOf[UTF8String], sets, isLang)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // bind the compiled wordlists once (the TokenSetStats pattern) —
    // no per-row Map lookup or profile-string compare in the hot path
    val setsRef = ctx.addReferenceObj("profileSets", sets,
      "java.util.HashSet[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.TextProfileStats$$.MODULE$$.stats($c, $setsRef, $isLang)")
  }

  override protected def withNewChildInternal(newChild: Expression): TextProfileStats =
    copy(child = newChild)
}

object TextProfileStats {

  /** Wordlist stacks per profile — shared source of truth with
    * [[WordlistHits.Profiles]]; compiled to String sets once per JVM
    * (tokens here are Java substrings, and String equality is byte
    * equality for the valid UTF-16 both sides hold).
    */
  val Profiles: Map[String, Array[java.util.HashSet[String]]] =
    WordlistHits.Profiles.map { case (name, lists) =>
      name -> lists.map { ws =>
        val s = new java.util.HashSet[String](ws.size * 2)
        ws.foreach(s.add)
        s
      }.toArray
    }

  def stats(s: UTF8String, sets: Array[java.util.HashSet[String]],
      isLang: Boolean): ArrayData = {
    val counts = new Array[Long](sets.length)
    var nToks = 0L
    var cjk = 0L
    val str = s.toLowerCase.toString
    var i = 0
    var runStart = -1
    def closeRun(end: Int): Unit = {
      nToks += 1
      val tok = str.substring(runStart, end)
      var j = 0
      while (j < sets.length) {
        if (sets(j).contains(tok)) counts(j) += 1
        j += 1
      }
    }
    while (i < str.length) {
      val cp = str.codePointAt(i)
      if (isLang && cp >= 0x4e00 && cp <= 0x9fff) cjk += 1
      val tokChar =
        if (isLang) Character.isLetter(cp)
        else (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z') ||
          (cp >= '0' && cp <= '9') || cp == '_'
      if (tokChar) {
        if (runStart < 0) runStart = i
      } else if (runStart >= 0) {
        closeRun(i); runStart = -1
      }
      i += Character.charCount(cp)
    }
    if (runStart >= 0) closeRun(str.length)
    val out = new Array[Long](1 + sets.length + (if (isLang) 1 else 0))
    out(0) = nToks
    System.arraycopy(counts, 0, out, 1, counts.length)
    if (isLang) out(out.length - 1) = cjk
    new GenericArrayData(out)
  }

  def apply(str: Column, profile: String): Column =
    GraftSqlBridge.column(
      TextProfileStats(GraftSqlBridge.expression(str), profile))

  private[plans] val info = new ExpressionInfo(
    classOf[TextProfileStats].getCanonicalName, null, "text_profile_stats",
    "_FUNC_(str) - [token count, per-wordlist hits...] language/toxicity" +
      " signals of a string (langid profile appends CJK codepoints).",
    "", "", "", "string_funcs", "4.0.0", "", "scala_udf")

  private[plans] val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 1, "text_profile_stats takes one argument")
    TextProfileStats(args.head, "langid")
  }
}
