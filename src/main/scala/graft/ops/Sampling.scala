package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling (O4 family, made reproducible at scale).
  *
  * RNG-stream sampling (`df.sample`) changes with partitioning; these
  * samplers derive keep-decisions from content hashes, so the same
  * inputs give the same sample on any cluster layout — and, because
  * md5 agrees across engines, the per-group variant is DuckDB-oracle-
  * checkable, unlike seeded RNG samples (SURVEY §2.8 O4 exclusion).
  */
object Sampling {

  /** k uniform rows per group: rank by the md5 of the id (a uniform
    * priority), keep the first k. One keyed shuffle; ties impossible
    * for distinct ids.
    */
  def uniformPerGroup(df: DataFrame, groupCol: String, idCol: String,
                      k: Int): DataFrame = {
    val w = Window.partitionBy(groupCol)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= k)
  }

  /** Weighted sample without replacement, RNG-free: Efraimidis &
    * Spirakis A-ES (IPL 2006) — each row gets priority u^(1/w) for a
    * uniform u, and the k largest priorities are an exact weighted
    * sample — with the uniform DERIVED FROM THE ID's md5 instead of an
    * RNG stream. Equivalent max-key is ln(u)/w (monotone transform),
    * floor-quantized ×10¹² to a BIGINT so the ranking — and therefore
    * the SAMPLE ITSELF — is engine-portable and oracle-checkable, the
    * same content-addressed trick as [[uniformPerGroup]] and
    * `Retrieval.splitAssign`. Same inputs ⇒ same sample on any
    * cluster layout, any engine.
    *
    * u = (first 8 md5 hex digits + 1) / (2³² + 1) ∈ (0, 1);
    * non-positive weights clamp to 1e-4 (w ≤ 0 would flip the key's
    * sign and DOMINATE the sample — the classic A-ES foot-gun — while
    * w → 0⁺ correctly means "effectively never chosen"); fractional
    * weights down to 1e-4 are VALID A-ES weights and pass through
    * untouched. The floor is sized so the quantized key stays inside
    * a signed 64-bit long: |ln u| ≤ 22, and 22/1e-4 · 1e12 ≈ 2.2e17
    * — an unbounded w → 0 would overflow the BIGINT (and DuckDB
    * errors on out-of-range casts where Spark saturates).
    *
    * Scale shape: one per-row projection + a global top-k. The top-k
    * here is orderBy+limit (TakeOrderedAndProject — k rows per
    * partition to the driver, never a global sort of the corpus).
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int): DataFrame = {
    val u = (conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("double") + 1.0d) / 4294967297.0d
    // NaN must be routed through the clamp explicitly: greatest(NaN, x)
    // returns NaN, NaN arithmetic floors to a 0 key on cast, and 0
    // outranks every legitimate (strictly negative) key — the same
    // sample-takeover the clamp exists to prevent. nanvl(NaN -> null)
    // then coalesce gives NaN the null treatment (default weight 1).
    // For integer weight columns (this engine's callers) nanvl is a
    // no-op, so the DuckDB oracle mirror is unchanged.
    val w = greatest(
      coalesce(nanvl(col(weightCol).cast("double"), lit(null).cast("double")),
        lit(1.0d)),
      lit(1e-4d))
    df.withColumn("es_key_q", floor(log(u) / w * 1e12d).cast("long"))
      .orderBy(col("es_key_q").desc, col(idCol))
      .limit(k)
  }

  /** Token-budget-constrained selection — the data-constrained-corpus
    * curation op: rank documents by (score DESC, id ASC) and keep the
    * maximal quality-first prefix whose token total fits the budget.
    * Prefix semantics (cut at the budget line) rather than
    * skip-and-continue: the skip variant's keep-decision for row i
    * depends on every earlier decision — sequential state that neither
    * an oracle nor a cluster-parallel plan can replay — while the
    * prefix is a pure function of the running total, which the engine
    * computes with [[Pack.withRunningTotalOrdered]]'s two-pass
    * partition-offset scheme: per-partition token sums → one
    * O(#partitions) driver prefix → local running totals. No global
    * window, no single-partition sort, at any corpus size.
    *
    * Output: input columns + `cum_before` (exclusive prefix token sum
    * in selection order) + `kept` (this row fits the budget).
    */
  def budgetSelect(df: DataFrame, idCol: String, scoreCol: String,
                   tokensCol: String, budget: Long): DataFrame =
    Pack.withRunningTotalOrdered(df,
        Seq(col(scoreCol).desc, col(idCol).asc), tokensCol, "cum_before")
      .withColumn("kept", col("cum_before") + col(tokensCol) <= budget)

  /** Per-group token budgets — how multilingual / multi-source mixes
    * are actually specified ("2 B tokens of each language, best docs
    * first"). Same prefix semantics as [[budgetSelect]], but the
    * running total is per group.
    *
    * Skew routing: delegated to
    * [[Pack.withRunningTotalPerGroupHybrid]] — a partitioned window
    * puts one group's ENTIRE row set through a single task (fine for
    * the typical language mix, catastrophic for a 99%-one-language
    * corpus), so groups whose row count exceeds `skewThreshold` take
    * the grouped two-pass partition-offset scheme where a dominant
    * group spreads over many range partitions; everything else keeps
    * the window. The two paths compute the identical deterministic
    * prefix (score DESC, id ASC; unique ids), so routing never changes
    * a result — pinned by the SkewSpec parity test. Null group keys
    * fall to the window path (callers fold null→'' per convention).
    */
  def budgetSelectPerGroup(df: DataFrame, groupCol: String, idCol: String,
                           scoreCol: String, tokensCol: String,
                           budgetPerGroup: Long,
                           skewThreshold: Long = 2000000L): DataFrame =
    Pack.withRunningTotalPerGroupHybrid(df, groupCol,
        Seq(col(scoreCol).desc, col(idCol).asc), tokensCol, "cum_before",
        skewThreshold)
      .withColumn("kept", col("cum_before") + col(tokensCol) <= budgetPerGroup)
}
