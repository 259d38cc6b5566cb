package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.TextMetrics

/** Corpus vocabulary statistics: top-V vocabulary, per-document
  * out-of-vocabulary rate, and bigram collocations by lift — the
  * corpus-health checks run before committing a tokenizer vocabulary
  * (OOV-heavy docs either get dropped or the vocab grows; strong
  * collocations become candidate multi-word vocab entries).
  */
object Vocab {

  /** Top `v` words by corpus frequency, ties broken by the word itself —
    * fully deterministic. Plans as TakeOrdered over the word-count
    * aggregate: each partition keeps its local top v and the driver
    * merges v·partitions rows — no global sort, no single-reducer
    * ranking window.
    */
  def topVocab(df: DataFrame, textCol: String = "text",
               v: Int = 500): DataFrame =
    df.select(explode(TextMetrics.tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("tok_count"))
      .orderBy(desc("tok_count"), asc("tok"))
      .limit(v)

  /** Per-document OOV rate against [[topVocab]]. The vocab (≤ v rows)
    * joins broadcast; the only corpus-sized exchange is the per-doc
    * count aggregate (map-side partials) keyed on the high-cardinality
    * doc id. Documents with zero tokens are excluded (no denominator).
    */
  def oovRate(df: DataFrame, idCol: String = "doc_id",
              textCol: String = "text", v: Int = 500): DataFrame = {
    val vocab = broadcast(topVocab(df, textCol, v)
      .select(col("tok"), lit(1).as("in_vocab")))
    df.select(col(idCol).as("id"), TextMetrics.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("id"), size(col("toks")).as("n_tokens"),
        explode(col("toks")).as("tok"))
      .join(vocab, Seq("tok"), "left")
      .groupBy("id")
      .agg(first("n_tokens").as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("id").as(idCol),
        col("n_tokens").cast("long").as("n_tokens"), col("n_oov"),
        (col("n_oov").cast("double") / col("n_tokens").cast("double"))
          .as("oov_rate"))
  }

  /** Top bigram collocations by lift:
    * `(c(ab)/N_b) / ((c(a)/N_u) · (c(b)/N_u))` — how much more often the
    * pair co-occurs than independence predicts (phrase-mining statistic;
    * the monotone exp of PMI). No logarithm on purpose: `ln` differs in
    * the last ulp across libms, while the pure ratio is the same IEEE
    * double in any engine given the fixed association order below, so
    * the query stays hash-checkable against the oracle.
    *
    * One corpus-sized shuffle total: each doc emits one (w, next-w)
    * pair per token (the final token pairs with null so unigram counts
    * fall out of the same aggregate), everything after the first
    * groupBy operates on the bigram table — corpus-independent size.
    * Final ranking is TakeOrdered (per-partition top-N, driver merge).
    */
  def bigramLift(df: DataFrame, textCol: String = "text",
                 minCount: Long = 5, topN: Int = 20): DataFrame = {
    val pairs = df
      .select(TextMetrics.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(explode(transform(sequence(lit(1), size(col("toks"))),
        i => struct(element_at(col("toks"), i).as("w1"),
          when(i < size(col("toks")), element_at(col("toks"), i + 1))
            .as("w2")))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    val b = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("cnt"))
    // every token occurrence appears exactly once as w1 → occurrence
    // counts and the corpus totals all derive from the bigram table
    val u = b.groupBy(col("w1").as("w")).agg(sum("cnt").as("cw"))
    val totals = b.agg(
      sum("cnt").cast("double").as("nu"),
      sum(when(col("w2").isNotNull, col("cnt")).otherwise(0L))
        .cast("double").as("nb"))
    b.filter(col("w2").isNotNull && col("cnt") >= minCount)
      .crossJoin(broadcast(totals))
      .join(broadcast(u.select(col("w").as("w1"), col("cw").as("ca"))), Seq("w1"))
      .join(broadcast(u.select(col("w").as("w2"), col("cw").as("cb"))), Seq("w2"))
      .select(col("w1"), col("w2"), col("cnt").as("pair_count"),
        ((col("cnt").cast("double") / col("nb")) /
          ((col("ca").cast("double") / col("nu")) *
            (col("cb").cast("double") / col("nu")))).as("lift"))
      .orderBy(desc("lift"), asc("w1"), asc("w2"))
      .limit(topN)
  }
}
