package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, attach the most recent right
  * row (right.ts <= left.ts) per key. A capability the reference lacks
  * but a time-series-adjacent pipeline needs; built by composition
  * (builder-brief preference (a)): tag sides, unionByName, one running
  * `last(_, ignoreNulls)` window per payload column, keep left rows.
  *
  * Scale shape: exactly ONE hash-partitioned shuffle on the key — never
  * a range join or per-key cross join; window state is a single running
  * value per payload column. Skew follows key skew like any keyed
  * window (salt upstream if one key dominates).
  *
  * Left rows with no prior right row keep null payloads (LEFT ASOF
  * semantics, matching DuckDB's ASOF LEFT JOIN). At equal timestamps the
  * right row sorts first, so an exactly-simultaneous right row IS
  * visible to the left row (inclusive bound).
  *
  * `payloadCols` must not collide with left column names — rename on the
  * right side first.
  */
object AsOfJoin {

  def asofBackward(left: DataFrame, right: DataFrame, keyCol: String,
                   tsCol: String, payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "asofBackward needs at least one payload column")
    require(!payloadCols.exists(left.columns.contains),
      s"payload columns ${payloadCols.mkString(",")} collide with left side")
    val l = left.withColumn("__asof_side", lit(1))
    val r = right.select((keyCol +: tsCol +: payloadCols).map(col): _*)
      .withColumn("__asof_side", lit(0))
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).asc, col("__asof_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payloadCols.foldLeft(l.unionByName(r, allowMissingColumns = true)) {
      (df, c) => df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col("__asof_side") === 1).drop("__asof_side")
  }
}
