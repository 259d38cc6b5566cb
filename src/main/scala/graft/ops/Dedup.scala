package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.Normalize

/** Deduplication (SURVEY.md §2.9, D1–D3) — the reference's flagship
  * relational operator, re-expressed as hash-partitioned window functions.
  *
  * Reference behavior (duplication.py:100-196): canonicalise -> SHA256 ->
  * keep the FIRST occurrence per hash (pandas row order), mark the rest
  * `is_dup_exact` with `dup_of` = first row's dedup_id; then a near-dup
  * pass keyed on the first 500 canon chars, restricted to docs with
  * canon length >= 200, marking non-exact-dup later rows `near_duplicate`.
  *
  * Scale design: "first occurrence" order comes from the persistent
  * `ingest_seq` column (SURVEY §1), so the windows are plain
  * hash-partitioned shuffles — no global sort, no driver state. Near-dup
  * candidates are physically split out before the window so non-candidate
  * rows (including the degenerate empty-canon key) never enter the
  * shuffle — that's the skew hazard at 100 TB (SURVEY §2.9 scale note).
  */
object Dedup {

  val NearDupMinLen = 200
  val NearKeyChars = 500

  /** D1+D3: adds dedup_id, exact_canon_text, exact_hash, is_dup_exact,
    * dup_of, and the `exact_duplicate` drop reason.
    */
  def exactDedup(df: DataFrame, textCol: String = "text_pii_masked",
                 seqCol: String = "ingest_seq"): DataFrame = {
    val idCol =
      if (df.columns.contains("doc_id")) col("doc_id").cast("string")
      else col(seqCol).cast("string")
    val w = Window.partitionBy("exact_hash").orderBy(seqCol)
    val withFlags = df
      .withColumn("dedup_id", idCol)
      .withColumn("exact_canon_text", Normalize.canonExact(col(textCol)))
      .withColumn("exact_hash", Normalize.sha256Hex(col("exact_canon_text")))
      .withColumn("__rn", row_number().over(w))
      .withColumn("dup_of", when(col("__rn") > 1, first("dedup_id").over(w)))
      .withColumn("is_dup_exact", col("__rn") > 1)
      .drop("__rn")
    Filters.applyRules(withFlags, Seq(col("is_dup_exact") -> "exact_duplicate"))
  }

  /** D2: near-dup pass over the output of `exactDedup`. */
  def nearDedup(df: DataFrame, textCol: String = "text_pii_masked",
                seqCol: String = "ingest_seq"): DataFrame = {
    val keyed = df.withColumn("near_key",
      Normalize.canonNear(col(textCol), NearKeyChars))
    val isCandidate =
      (length(col("exact_canon_text")) >= NearDupMinLen) && (col("near_key") =!= "")

    val cand = keyed.filter(isCandidate)
    val rest = keyed.filter(!isCandidate)
      .withColumn("is_dup_near", lit(false))

    val w = Window.partitionBy("near_key").orderBy(seqCol)
    val candFlagged = cand
      .withColumn("__rn", row_number().over(w))
      .withColumn("__first_id", first("dedup_id").over(w))
      .withColumn("is_dup_near", col("__rn") > 1 && !col("is_dup_exact"))
      .withColumn("dup_of",
        coalesce(col("dup_of"), when(col("is_dup_near"), col("__first_id"))))
      .drop("__rn", "__first_id")

    val unioned = candFlagged.unionByName(rest)
    Filters.applyRules(unioned, Seq(col("is_dup_near") -> "near_duplicate"))
  }

  /** D1∘D2 composition, reference stage-4 semantics. */
  def dedupStage(df: DataFrame, textCol: String = "text_pii_masked",
                 seqCol: String = "ingest_seq"): DataFrame =
    nearDedup(exactDedup(df, textCol, seqCol), textCol, seqCol)
}
