package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequential-behavior analytics over an event frame: n-step conversion
  * funnels and first-seen cohort retention. Both are chains of filtered
  * min-aggregates and user-keyed joins — no windows, no self-join
  * explosion — so state per step is one row per surviving user.
  *
  * Timestamps are taken as an INTEGER column (microseconds via
  * `unix_micros`, or any monotone long): strict '>' on a float or on
  * engines with different sub-unit precision (nanos parquet vs micros
  * load) would disagree at boundaries.
  */
object Funnel {

  /** Users completing each successive step strictly AFTER the previous
    * one: returns one row `n_step_1 .. n_step_k` (count of users whose
    * earliest qualifying occurrence of step i follows their step i-1
    * time). The fold keeps only (user, time) per step, so each join
    * input is at most one row per user.
    */
  def sequentialFunnel(events: DataFrame, steps: Seq[String],
                       userCol: String = "user_id",
                       typeCol: String = "event_type",
                       tsCol: String = "us"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val ev = events.select(col(userCol), col(typeCol), col(tsCol))
    val firstStep = ev.filter(col(typeCol) === steps.head)
      .groupBy(userCol).agg(min(tsCol).as("__t"))
    val perStep = steps.tail.scanLeft(firstStep) { (prev, step) =>
      ev.filter(col(typeCol) === step)
        .join(prev.select(col(userCol), col("__t").as("__prev")), Seq(userCol))
        .filter(col(tsCol) > col("__prev"))
        .groupBy(userCol).agg(min(tsCol).as("__t"))
    }
    perStep.zipWithIndex
      .map { case (df, i) => df.agg(count(lit(1)).as(s"n_step_${i + 1}")) }
      .reduce(_ crossJoin _)
  }

  /** First-seen-period cohorts counted per period offset. `periodCol`
    * is any truncated period column (e.g. `date_trunc("week", ts)`);
    * `offsetOf(period, cohort)` maps the pair to an integer offset.
    * Output columns are period-agnostic: (cohort_period, period_offset,
    * n_users).
    */
  def cohortRetention(activity: DataFrame, userCol: String,
                      periodCol: String,
                      offsetOf: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column): DataFrame = {
    val wk = activity.select(col(userCol), col(periodCol)).distinct()
    val cohort = wk.groupBy(userCol).agg(min(periodCol).as("cohort_period"))
    wk.join(cohort, Seq(userCol))
      .withColumn("period_offset", offsetOf(col(periodCol), col("cohort_period")))
      .groupBy("cohort_period", "period_offset")
      // countDistinct, not count: offsetOf may legally COLLAPSE periods
      // (e.g. monthly offsets over weekly activity), putting one user in
      // a group several times — n_users must stay a user count
      .agg(countDistinct(col(userCol)).as("n_users"))
  }
}
