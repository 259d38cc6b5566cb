package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextMetrics

/** Benchmark decontamination — the pretraining-pipeline op the reference
  * lacks but every production corpus build runs: flag training documents
  * that share verbatim n-grams with an evaluation/benchmark set, so eval
  * answers don't leak into the training data.
  *
  * Scale shape: the benchmark side is small (eval suites are thousands
  * of docs, not billions) — its distinct n-gram set is broadcast, so the
  * corpus side never shuffles: explode → broadcast-hash semi-match →
  * partial-count per doc. At 100 TB the corpus n-grams would be 64-bit
  * [[SketchDedup.shingleHashes]] instead of strings (8 bytes/gram on the
  * wire instead of ~30); string grams are kept here because they are
  * engine-portable (the DuckDB oracle reproduces them verbatim).
  */
object Decontaminate {

  private def grams(df: DataFrame, idCol: String, textCol: String,
                    n: Int): DataFrame =
    df.filter(trim(coalesce(col(textCol), lit(""))) =!= "")
      .select(col(idCol).as("id"), TextMetrics.tokens(col(textCol)).as("toks"))
      .select(col("id"),
        explode(SketchDedup.shinglesFromTokens(col("toks"), n)).as("gram"))

  /** Per corpus document: how many of its distinct n-grams appear
    * anywhere in the benchmark set, plus the contamination flag. Docs
    * with zero overlap are kept (n_shared = 0) so the caller can both
    * filter and report.
    */
  def overlapReport(corpus: DataFrame, benchmark: DataFrame,
                    idCol: String, textCol: String, n: Int = 4): DataFrame = {
    val benchGrams = grams(benchmark, idCol, textCol, n)
      .select("gram").distinct()
    val counts = grams(corpus, idCol, textCol, n)
      .join(broadcast(benchGrams), Seq("gram"))
      .groupBy("id").agg(count(lit(1)).as("n_shared"))
    corpus.select(col(idCol).as("id"))
      .join(counts, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        (coalesce(col("n_shared"), lit(0L)) > 0).as("contaminated"))
  }
}
