package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed storage for co-located joins (builder brief: "bucketing for
  * co-located joins").
  *
  * Writing both sides of a recurring equi-join bucketed (+sorted) by the
  * join key makes every later join on that key shuffle-free AND
  * sort-free: each task zips bucket i of both tables. At 100 TB this
  * converts the nightly fact⋈fact join from a full network shuffle into
  * a local merge — the single biggest shuffle eliminator Spark offers
  * for repeated join workloads.
  */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted table at `path`, registered
    * as `table` in the session catalog (external table — bucket metadata
    * lives in the catalog, data at the path).
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    key: String, buckets: Int = 32): Unit =
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
}
