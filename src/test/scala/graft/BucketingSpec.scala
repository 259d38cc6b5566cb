package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Bucketing

/** Co-located bucketed join: same key, same bucket count on both sides
  * -> the equi-join runs without any Exchange (and without Sort, since
  * buckets are sort-by'd).
  */
class BucketingSpec extends SparkTestBase {

  test("bucketed-by-key tables join with zero shuffles") {
    val base = Files.createTempDirectory("buckets").toString
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
    val lineitem = Tables.lineitem(spark, "/root/testdata/sf0.001")
    Bucketing.writeBucketed(orders, "b_orders", s"$base/orders", "o_orderkey", 8)
    Bucketing.writeBucketed(lineitem, "b_lineitem", s"$base/lineitem", "l_orderkey", 8)
    val oldThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // sf0.001 fixtures are broadcast-size; disable broadcast so the test
    // exercises the co-located path a 100 TB fact⋈fact join would take
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
      assert(plan.contains("Bucketed: true"), s"scan not bucketed:\n$plan")
      // exactly one shuffle in the whole plan: the final tiny aggregation;
      // the join itself reads co-located buckets
      val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(shuffles === 1, s"bucketed join must not shuffle:\n$plan")
      // result parity with the unbucketed join
      val expect = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
        .collect().map(_.toSeq).toSet
      assert(joined.collect().map(_.toSeq).toSet === expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
