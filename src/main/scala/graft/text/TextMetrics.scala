package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Per-row numeric text metrics (SURVEY.md §2.3, M1–M6).
  *
  * Reference behavior:
  *  - M1/M2 char_len/word_count:  text_clean_and_filter.py:124-127
  *  - M3/M4 quality metrics:      text_clean_and_filter.py:206-236
  *  - M5 token stats:             deep_clean_and_pii.py:219-260
  *  - M6 non_latin_ratio:         text_clean_and_filter.py:451-469
  *
  * All native expressions (higher-order array functions, no UDFs) so the
  * whole metric block stays inside one whole-stage-codegen span.
  */
object TextMetrics {

  /** Whitespace tokens; empty/null/whitespace-only -> empty array
    * (Spark's split("") would yield [""], the reference yields []).
    */
  def tokens(c: Column): Column =
    when(c.isNull || trim(c) === "", array().cast("array<string>"))
      .otherwise(split(trim(c), "\\s+"))

  /** M1 on text_norm: length; stays NULL for null input (pandas .str.len). */
  def charLen(c: Column): Column = length(c)

  /** M2: whitespace token count; null -> 0 (reference fillna("")).
    * Counted by the string-walking [[graft.plans.TokenTextStats]]
    * kernel — no token array, no regex; bit-equal to the
    * `size(split(trim(c), "\\s+"))` form (parity anchor below).
    */
  def wordCount(c: Column): Column =
    element_at(graft.plans.TokenTextStats(coalesce(c, lit("")), Nil), 1)
      .cast("int")

  /** The split form [[wordCount]] replaced — parity anchor. */
  private[graft] def wordCountSplit(c: Column): Column = size(tokens(c))

  /** M1' (compute_quality_metrics n_chars): null -> 0. */
  def nChars(c: Column): Column = coalesce(length(c), lit(0))

  /** M3: alphabetic chars / total chars; 0 when empty. Python isalpha ~ \p{L}.
    * Letter units come from the compiled one-pass kernel
    * ([[graft.plans.CharClassStats]]) — bit-equal to the
    * `length(regexp_replace(c, "[^\p{L}]", ""))` form it replaced
    * (parity-pinned in TextOpsSpec), without that form's per-row
    * filtered-copy allocation (62% of cleanAndFilter profiled at 10×,
    * together with [[nonLatinRatio]]'s double strip).
    */
  def alphaRatio(c: Column): Column = {
    val n = length(c)
    // coalesce matches [[nonLatinRatio]]'s kernel argument EXACTLY so
    // codegen subexpression elimination unifies the two CharClassStats
    // calls into ONE string walk when both ratios are projected (they
    // are, in stage 2) — value-identical: the when(n > 0) guard already
    // returns 0.0 for NULL input before the kernel result is read
    when(n > 0,
      element_at(graft.plans.CharClassStats(coalesce(c, lit(""))), 1)
        .cast("double") / n.cast("double"))
      .otherwise(lit(0.0))
  }

  /** The regex form [[alphaRatio]] replaced — kept for the parity spec
    * and as the oracle-SQL documentation of the semantics.
    */
  private[graft] def alphaRatioRegex(c: Column): Column = {
    val n = length(c)
    when(n > 0,
      length(regexp_replace(c, "[^\\p{L}]", "")).cast("double") / n.cast("double"))
      .otherwise(lit(0.0))
  }

  /** M4: 1 - unique_words/n_words; 0 when no words. Tokenized AND
    * distinct-counted by the one-pass string-walking
    * [[graft.plans.TokenTextStats]] kernel — the split+array form this
    * replaces built a full token array per row just to count it
    * (integer counts, so parity with the kernel-over-split form is
    * equality, TextOpsSpec). Shares its kernel call with [[wordCount]]
    * through codegen subexpression elimination when both are projected.
    */
  def repetitionRatio(c: Column): Column = {
    val k = graft.plans.TokenTextStats(coalesce(c, lit("")), Nil)
    val n = element_at(k, 1)
    when(n > 0,
      lit(1.0) - element_at(k, 2).cast("double") / n.cast("double"))
      .otherwise(lit(0.0))
  }

  /** The array_distinct form [[repetitionRatio]] replaced — parity anchor. */
  private[graft] def repetitionRatioHof(c: Column): Column = {
    val t = tokens(c)
    when(size(t) > 0,
      lit(1.0) - size(array_distinct(t)).cast("double") / size(t).cast("double"))
      .otherwise(lit(0.0))
  }

  /** M5 stopword set (behavioral data, deep_clean_and_pii.py:211-216). */
  val EnStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "for", "on", "at",
    "is", "it", "this", "that", "with", "as", "by", "from", "be", "are",
    "was", "were", "will", "would", "can", "could", "has", "have", "had",
    "about", "into", "over", "after", "before", "between", "up", "down")

  /** M5: (token_count, unique_tokens, unique_token_ratio, stopword_ratio).
    * Stopword match lowercases the token; uniqueness is case-sensitive —
    * exactly the reference's asymmetry.
    */
  def tokenCount(c: Column): Column = size(tokens(c))

  def uniqueTokens(c: Column): Column =
    element_at(graft.plans.TokenSetStats(tokens(c), Nil), 1).cast("int")

  def uniqueTokenRatio(c: Column): Column = {
    val t = tokens(c)
    when(size(t) > 0,
      element_at(graft.plans.TokenSetStats(t, Nil), 1).cast("double")
        / size(t).cast("double"))
      .otherwise(lit(0.0))
  }

  def stopwordRatio(c: Column): Column = {
    val t = tokens(c)
    when(size(t) > 0,
      element_at(graft.plans.TokenSetStats(t, EnStopwords), 2).cast("double")
        / size(t).cast("double"))
      .otherwise(lit(0.0))
  }

  /** The HOF forms the kernel versions replaced — parity anchors. */
  private[graft] def uniqueTokenRatioHof(c: Column): Column = {
    val t = tokens(c)
    when(size(t) > 0, size(array_distinct(t)).cast("double") / size(t).cast("double"))
      .otherwise(lit(0.0))
  }

  private[graft] def stopwordRatioHof(c: Column): Column = {
    val t = tokens(c)
    val stops = typedlit(EnStopwords)
    when(size(t) > 0,
      size(filter(t, tok => array_contains(stops, lower(tok)))).cast("double")
        / size(t).cast("double"))
      .otherwise(lit(0.0))
  }

  /** M6: non-ASCII alphabetic chars / alphabetic chars; 0 if no letters.
    * Same one-pass kernel as [[alphaRatio]] (the regex form built TWO
    * filtered copies per row); parity-pinned in TextOpsSpec.
    */
  def nonLatinRatio(c: Column): Column = {
    val k = graft.plans.CharClassStats(coalesce(c, lit("")))
    val total = element_at(k, 1)
    when(total > 0,
      element_at(k, 2).cast("double") / total.cast("double"))
      .otherwise(lit(0.0))
  }

  /** The regex form [[nonLatinRatio]] replaced — parity-spec anchor. */
  private[graft] def nonLatinRatioRegex(c: Column): Column = {
    val letters = regexp_replace(coalesce(c, lit("")), "[^\\p{L}]", "")
    val total = length(letters)
    when(total > 0,
      length(regexp_replace(letters, "[\\x00-\\x7F]", "")).cast("double")
        / total.cast("double"))
      .otherwise(lit(0.0))
  }

  /** A4 (small-doc default form): max single-token frequency / token count.
    * O(unique·n) per row via higher-order functions — fine at the
    * reference's <=5000-word docs; the explode+groupBy variant for truly
    * huge docs is Report.maxTokenFreqExploded.
    * ⚠ single-expression form: the split subtree sits inside the filter
    * lambda and re-evaluates per distinct token. Hot paths go through
    * [[withTokenStats]], which stages the token array as an attribute.
    */
  def maxTokenFreqRatio(c: Column): Column = maxTokenFreqFromTokens(tokens(c))

  /** Max token frequency ratio via the compiled one-pass kernel
    * ([[graft.plans.TokenDistStats]]) — bit-equal to the interpreted
    * `array_max(transform(array_distinct...))` chain it replaced
    * (int max over counts is order-free), without that chain's
    * O(distinct·n)-per-row cost. coalesce mirrors the old
    * `when(size > 0, ...).otherwise(0.0)` null-array fallthrough.
    */
  private def maxTokenFreqFromTokens(t: Column): Column =
    coalesce(element_at(graft.plans.TokenDistStats(t), 2), lit(0.0))

  /** Shannon entropy (nats) of a doc's token distribution — the
    * repetition/diversity quality signal: near 0 for "spam spam spam",
    * ln(n) for all-distinct tokens. Computed per row with ZERO shuffles
    * via H = ln(n) − (Σ c·ln c)/n over per-distinct-token counts c (the
    * explode → groupBy formulation spends two exchanges on what is
    * row-local arithmetic). The distinct array is SORTED before the sum
    * so float addition order — and thus the bits — match the oracle's
    * (DuckDB `list_distinct` has no order guarantee; `list_sort` +
    * `array_sort` pin one).
    *
    * Evaluated by the compiled one-pass kernel
    * ([[graft.plans.TokenDistStats]]: sort once, run-length count) —
    * bit-equal to the interpreted `aggregate(transform(array_sort(
    * array_distinct(t)), ...)` chain it replaced (same ascending-binary
    * fold order, same StrictMath.log; TokenDistStatsSpec pins the bits),
    * without that chain's O(distinct·n)-per-row cost: a row of 150k
    * UNIQUE tokens took minutes interpreted and takes milliseconds
    * compiled (HostileInputSpec's distinct-token flood). coalesce
    * mirrors the old `when(size > 0, ...)` null-array fallthrough.
    */
  def tokenEntropyFromTokens(t: Column): Column =
    coalesce(element_at(graft.plans.TokenDistStats(t), 1), lit(0.0))

  /** M5+A4 staged: tokenize ONCE into an attribute, derive all five
    * token stats from it (value-identical to the single-column forms —
    * same expressions over a bound array instead of an inline split,
    * which would otherwise re-run per reference and, inside the A4
    * lambda, per distinct token).
    */
  def withTokenStats(df: org.apache.spark.sql.DataFrame,
                     c: Column): org.apache.spark.sql.DataFrame = {
    // All five stats from ONE string-walking compiled pass
    // ([[graft.plans.TokenTextStats]]) — no token array is ever
    // materialized (the former staging split the text, then ran
    // TokenSetStats + TokenDistStats over the array: three walks plus
    // one UTF8String allocation per token). Value parity with the
    // array stagings is exact because every output is an integer
    // count and each ratio is a single IEEE division of exact
    // integers — identical operands, identical bits (KernelFuzzSpec
    // pins all four against the array forms; TextOpsSpec pins the
    // column semantics). coalesce("") keeps the tokens() null guard:
    // the kernel maps the empty string to [0,0,0,0], the same
    // zero-stats row the empty-array staging produced.
    val staged = df.withColumn("__tts",
      graft.plans.TokenTextStats(coalesce(c, lit("")), EnStopwords))
    val n = element_at(col("__tts"), 1)
    val nd = n.cast("double")
    staged
      .withColumn("token_count", n)
      .withColumn("unique_tokens", element_at(col("__tts"), 2))
      .withColumn("unique_token_ratio",
        when(n > 0, element_at(col("__tts"), 2).cast("double") / nd)
          .otherwise(lit(0.0)))
      .withColumn("stopword_ratio",
        when(n > 0, element_at(col("__tts"), 3).cast("double") / nd)
          .otherwise(lit(0.0)))
      .withColumn("max_token_freq_ratio",
        when(n > 0, element_at(col("__tts"), 4).cast("double") / nd)
          .otherwise(lit(0.0)))
      .drop("__tts")
  }

  /** The pre-kernel array-staged form of [[withTokenStats]], kept as
    * the parity anchor (KernelFuzzSpec evaluates both over fuzzed
    * strings and requires bit equality on all five columns).
    */
  def withTokenStatsArr(df: org.apache.spark.sql.DataFrame,
                        c: Column): org.apache.spark.sql.DataFrame = {
    val staged = df.withColumn("__toks", tokens(c))
      .withColumn("__tss", graft.plans.TokenSetStats(col("__toks"), EnStopwords))
    val t = col("__toks")
    staged
      .withColumn("token_count", size(t).cast("long"))
      .withColumn("unique_tokens", element_at(col("__tss"), 1))
      .withColumn("unique_token_ratio",
        when(size(t) > 0,
          element_at(col("__tss"), 1).cast("double") / size(t).cast("double"))
          .otherwise(lit(0.0)))
      .withColumn("stopword_ratio",
        when(size(t) > 0,
          element_at(col("__tss"), 2).cast("double") / size(t).cast("double"))
          .otherwise(lit(0.0)))
      .withColumn("max_token_freq_ratio", maxTokenFreqFromTokens(t))
      .drop("__toks", "__tss")
  }
}
