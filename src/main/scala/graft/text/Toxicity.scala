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
    *
    * ⚠ Inline HOF form: re-tokenizes once per referenced score (lambdas
    * block subexpression elimination). Semantic reference + tests only —
    * the pipeline and queries go through [[withToxicityColumns]].
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

  /** Staged fast path: tokenize once, count all five lists in one
    * native WordlistHits pass (hashed lookups, codegen), score from
    * attributes. Value-identical to [[scores]] — same arithmetic over
    * the same counts.
    */
  /** The ONE copy of the six-column toxicity scoring arithmetic over a
    * staged (token count, hit accessor) pair — shared by
    * [[withToxicityColumns]], [[withToxicityColumnsArr]] and
    * [[graft.text.LangId.withLangToxColumns]] so a cutoff tune can
    * never silently diverge between the stagings.
    */
  private[text] def appendToxColumns(df: org.apache.spark.sql.DataFrame,
      n: Column, hit: Int => Column): org.apache.spark.sql.DataFrame = {
    val (bad, ins, thr, sex, slr) = (hit(1), hit(2), hit(3), hit(4), hit(5))
    val toxicity = least(lit(1.0), (bad + ins + thr + sex + slr) / n * 5.0)
    df.withColumn("toxicity", toxicity)
      .withColumn("severe_toxicity", when(toxicity >= 0.9, 1.0).otherwise(0.0))
      .withColumn("insult", least(lit(1.0), ins / n * 5.0))
      .withColumn("threat", least(lit(1.0), thr / n * 5.0))
      .withColumn("identity_attack", least(lit(1.0), slr / n * 5.0))
      .withColumn("sexual_explicit", least(lit(1.0), sex / n * 5.0))
  }

  def withToxicityColumns(df: org.apache.spark.sql.DataFrame,
                          c: Column): org.apache.spark.sql.DataFrame = {
    val staged = df
      .withColumn("__tox_k",
        graft.plans.TextProfileStats(coalesce(c, lit("")), "toxicity"))
      .withColumn("__tox_n",
        greatest(lit(1L), element_at(col("__tox_k"), 1)).cast("double"))
    appendToxColumns(staged, col("__tox_n"),
      i => element_at(col("__tox_k"), i + 1).cast("double"))
      .drop("__tox_k", "__tox_n")
  }

  /** The WordlistHits-over-token-array staging [[withToxicityColumns]]
    * replaced — kept as the TextProfileStats kernel's parity anchor.
    */
  private[graft] def withToxicityColumnsArr(df: org.apache.spark.sql.DataFrame,
      c: Column): org.apache.spark.sql.DataFrame = {
    val staged = df
      .withColumn("__tox_toks", toxTokens(c))
      .withColumn("__tox_hits",
        graft.plans.WordlistHits(col("__tox_toks"), "toxicity"))
      .withColumn("__tox_n",
        greatest(lit(1), size(col("__tox_toks"))).cast("double"))
    val n = col("__tox_n")
    def hit(i: Int) = element_at(col("__tox_hits"), i).cast("double")
    val (bad, ins, thr, sex, slr) = (hit(1), hit(2), hit(3), hit(4), hit(5))
    val toxicity = least(lit(1.0), (bad + ins + thr + sex + slr) / n * 5.0)
    staged
      .withColumn("toxicity", toxicity)
      .withColumn("severe_toxicity", when(toxicity >= 0.9, 1.0).otherwise(0.0))
      .withColumn("insult", least(lit(1.0), ins / n * 5.0))
      .withColumn("threat", least(lit(1.0), thr / n * 5.0))
      .withColumn("identity_attack", least(lit(1.0), slr / n * 5.0))
      .withColumn("sexual_explicit", least(lit(1.0), sex / n * 5.0))
      .drop("__tox_toks", "__tox_hits", "__tox_n")
  }
}
