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
}
