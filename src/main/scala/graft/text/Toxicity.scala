package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Keyword-heuristic toxicity scoring (SURVEY.md §2.3 M9).
  *
  * Word lists are behavioral data from the reference
  * (text_clean_and_filter.py:303-322); they exist to FILTER OUT toxic
  * content from training corpora. Scores are scaled hit fractions in
  * [0,1], exactly the reference arithmetic
  * (text_clean_and_filter.py:325-366).
  */
object Toxicity {

  val BadWords = Seq(
    "fuck", "fucking", "shit", "bitch", "bastard", "asshole", "crap",
    "damn", "dick", "piss")
  val InsultWords = Seq("idiot", "moron", "stupid", "loser", "dumb")
  val ThreatWords = Seq("kill", "murder", "hurt", "shoot", "stab")
  val SexualWords = Seq("sex", "porn", "nude", "naked")
  val SlurWords   = Seq("nigger", "nigga", "faggot", "retard")

  /** `\w+` tokens of the lowercased text (reference tokenization). */
  def toxTokens(c: Column): Column =
    regexp_extract_all(lower(coalesce(c, lit(""))), lit("\\w+"), lit(0))

  private def hitCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => array_contains(typedlit(words), t)))

  /** Returns the six reference score columns, given the text column.
    * n_tokens floor of 1 matches `max(1, len(tokens))`.
    */
  def scores(c: Column): Map[String, Column] = {
    val toks = toxTokens(c)
    val n = greatest(lit(1), size(toks)).cast("double")
    val bad = hitCount(toks, BadWords).cast("double")
    val ins = hitCount(toks, InsultWords).cast("double")
    val thr = hitCount(toks, ThreatWords).cast("double")
    val sex = hitCount(toks, SexualWords).cast("double")
    val slr = hitCount(toks, SlurWords).cast("double")
    val toxicity = least(lit(1.0), (bad + ins + thr + sex + slr) / n * 5.0)
    Map(
      "toxicity" -> toxicity,
      "severe_toxicity" -> when(toxicity >= 0.9, 1.0).otherwise(0.0),
      "insult" -> least(lit(1.0), ins / n * 5.0),
      "threat" -> least(lit(1.0), thr / n * 5.0),
      "identity_attack" -> least(lit(1.0), slr / n * 5.0),
      "sexual_explicit" -> least(lit(1.0), sex / n * 5.0)
    )
  }
}
