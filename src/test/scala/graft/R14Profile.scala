package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-14 decomposition of the bench's slowest queries (fresh top of
  * the sf0.1 panel this session): substage variants per query family,
  * [[ProfileHarness]] discipline, so the optimization targets the slice
  * that is actually hot (guide §1.1-1.2) instead of the r12 guess list.
  *
  *   sbt 'Test/runMain graft.R14Profile /root/testdata/sf0.1 hh'
  */
object R14Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val group = args.lift(1).getOrElse("hh")
    val spark = ProfileHarness.session()
    import graft.ops.HeavyHitters

    def grams(d: String): DataFrame = Tables.documents(spark, d)
      .filter(col("text").isNotNull && length(col("text")) >= 3)
      .select(col("text"),
        explode(sequence(lit(1), length(col("text")) - 2)).as("i"))
      .select(col("text").substr(col("i"), lit(3)).as("tg"))

    def gramsBatched(d: String): DataFrame = Tables.documents(spark, d)
      .filter(col("text").isNotNull && length(col("text")) >= 3)
      .select(pmod(col("doc_id"), lit(3)).as("batch"), col("text"),
        explode(sequence(lit(1), length(col("text")) - 2)).as("i"))
      .select(col("batch"), col("text").substr(col("i"), lit(3)).as("tg"))

    val variants: Seq[(String, String => DataFrame)] = group match {
      case "hh" => Seq(
        "grams_count" -> (d => grams(d).agg(count(lit(1)).as("n"))),
        "mg_global" -> (d => grams(d)
          .agg(HeavyHitters.mgTopK(128)(col("tg")).as("hh"))),
        "retained_only" -> (d => grams(d)
          .agg(HeavyHitters.mgTopK(128)(col("tg")).as("hh"))
          .select(explode(col("hh.items")).as("it"))
          .select(col("it.tok").as("tg"), col("it.est").as("est"))),
        "join_only" -> { d =>
          val retained = grams(d)
            .agg(HeavyHitters.mgTopK(128)(col("tg")).as("hh"))
            .select(explode(col("hh.items")).as("it"))
            .select(col("it.tok").as("tg"), col("it.est").as("est"))
          grams(d).join(broadcast(retained), Seq("tg"))
            .groupBy(col("tg"), col("est"))
            .agg(count(lit(1)).as("exact_cnt"))
        },
        "hh_full" -> (d => queries.RelationalQueries.heavyHitters(spark, d)),
        "incr_full" -> (d => queries.RelationalQueries.incrHeavy(spark, d)),
        "raw_full" -> (d => queries.RelationalQueries.heavyHittersRaw(spark, d)))
      case "pr" => Seq(
        "edges_only" -> { d =>
          Tables.lineitem(spark, d)
            .join(Tables.orders(spark, d), col("l_orderkey") === col("o_orderkey"))
            .join(broadcast(Tables.customer(spark, d)), col("o_custkey") === col("c_custkey"))
            .join(broadcast(Tables.nation(spark, d).select(
              col("n_nationkey").as("ck"), col("n_name").as("dst"))),
              col("c_nationkey") === col("ck"))
            .join(broadcast(Tables.supplier(spark, d)), col("l_suppkey") === col("s_suppkey"))
            .join(broadcast(Tables.nation(spark, d).select(
              col("n_nationkey").as("sk"), col("n_name").as("src"))),
              col("s_nationkey") === col("sk"))
            .groupBy("src", "dst")
            .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
              .cast("long")).as("weight"))
        },
        "pr_full" -> (d => queries.TpchQueries.pagerankNations(spark, d)))
      case "cms" => Seq(
        "skL" -> (d => graft.ops.CountMin.sketch(
          Tables.lineitem(spark, d).select(col("l_orderkey").cast("string").as("k")),
          "k", width = 4096)),
        "skO" -> (d => graft.ops.CountMin.sketch(
          Tables.orders(spark, d).select(col("o_orderkey").cast("string").as("k")),
          "k", width = 4096)),
        "exact" -> (d => Tables.lineitem(spark, d).select(col("l_orderkey"))
          .join(Tables.orders(spark, d).select(col("o_orderkey")),
            col("l_orderkey") === col("o_orderkey"))
          .agg(count(lit(1)).as("exact_join"))),
        "cms_full" -> (d => queries.RelationalQueries.cmsJoinSize(spark, d)))
      case "kn" => Seq(
        "kn2_full" -> (d => queries.CurationQueries.knPerplexity(spark, d)),
        "kn3_full" -> (d => queries.CurationQueries.knTrigram(spark, d)))
      case _ => sys.error(s"unknown group $group")
    }
    if (args.lift(2).contains("explain"))
      variants.foreach { case (name, fn) =>
        println(s"==== PLAN $name ====")
        println(fn(dir).queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      }
    else ProfileHarness.run(s"R14:$group", spark, dir, variants)
    spark.stop()
  }
}
