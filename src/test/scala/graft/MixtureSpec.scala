package graft

import graft.ops.Mixture

/** Mixture sampling: deterministic, partition-independent, weight-true. */
class MixtureSpec extends SparkTestBase {

  private def docs = {
    import spark.implicits._
    (1 to 2000).map { i =>
      (i.toLong, if (i % 4 == 0) "rest" else "high_quality")
    }.toDF("doc_id", "subset")
  }

  test("temperature weights: alpha=1 is natural, alpha->0 flattens, sums to 1") {
    import spark.implicits._
    import graft.ops.Mixture
    // masses 8000 : 1000 : 1000 (one head stratum, two tails)
    val df = ((1 to 80).map(i => (i, "head", 100L))
      ++ (1 to 10).map(i => (100 + i, "tail_a", 100L))
      ++ (1 to 10).map(i => (200 + i, "tail_b", 100L)))
      .toDF("id", "src", "chars")
    def weights(alpha: Double) =
      Mixture.temperatureWeights(df, "src", "chars", alpha, budgetDocs = 1000L)
        .select("src", "weight").as[(String, Double)].collect().toMap
    val natural = weights(1.0)
    assert(math.abs(natural("head") - 0.8) < 1e-12)
    assert(math.abs(natural("tail_a") - 0.1) < 1e-12)
    val cooled = weights(0.3)
    // flattening: head loses, tails gain, order preserved
    assert(cooled("head") < natural("head"))
    assert(cooled("tail_a") > natural("tail_a"))
    assert(cooled("head") > cooled("tail_a"))
    assert(math.abs(cooled.values.sum - 1.0) < 1e-12)
    // allocation floors never oversubscribe the budget
    val alloc = Mixture.temperatureWeights(df, "src", "chars", 0.3, 1000L)
      .agg(org.apache.spark.sql.functions.sum("docs_alloc")).collect()(0).getLong(0)
    assert(alloc <= 1000L)
  }

  test("stratified sample hits configured fractions and is deterministic") {
    val frac = Map("high_quality" -> 0.8, "rest" -> 0.1)
    val s1 = Mixture.stratifiedSample(docs, "subset", "doc_id", frac)
    val s2 = Mixture.stratifiedSample(docs.repartition(7), "subset", "doc_id", frac)
    val ids1 = s1.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = s2.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 === ids2, "sample must not depend on partitioning")
    val byStratum = s1.groupBy("subset").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(byStratum("high_quality") - 1500 * 0.8) < 1500 * 0.1)
    assert(math.abs(byStratum.getOrElse("rest", 0L) - 500 * 0.1) < 500 * 0.15 + 10)
    // different seed -> different sample
    val s3 = Mixture.stratifiedSample(docs, "subset", "doc_id", frac, seed = 7L)
    assert(s3.select("doc_id").collect().map(_.getLong(0)).toSet !== ids1)
  }

  test("upweight: integer copies plus fractional remainder") {
    val up = Mixture.upweight(docs, "subset", "doc_id",
      Map("high_quality" -> 2.5, "rest" -> 0.5))
    val counts = up.groupBy("subset").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // high_quality: 2 full copies of 1500 + ~0.5*1500
    assert(counts("high_quality") >= 3400 && counts("high_quality") <= 4000,
      counts.toString)
    // rest: no full copy, ~0.5*500
    assert(counts("rest") >= 150 && counts("rest") <= 350, counts.toString)
    // full copies carry epoch >= 1, fractional rows epoch 0
    assert(up.filter(org.apache.spark.sql.functions.col("epoch") === 0).count() > 0)
  }
}
