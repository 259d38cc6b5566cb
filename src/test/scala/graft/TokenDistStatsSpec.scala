package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Parity contract for the compiled token-distribution kernel
  * ([[graft.plans.TokenDistStats]]): BIT-equal to the interpreted
  * higher-order chains it replaced — same ascending-binary fold order,
  * same log — across randomized token arrays, and linear where the
  * HOF form was O(distinct·n) per row.
  */
class TokenDistStatsSpec extends SparkTestBase {

  /** The exact HOF formulations the kernel replaced (from TextMetrics
    * pre-round-5) — the reference implementations for bit parity.
    */
  private def entropyHof(t: Column): Column =
    when(size(t) > 0,
      log(size(t).cast("double")) -
        aggregate(
          transform(array_sort(array_distinct(t)),
            x => size(filter(t, y => y === x)).cast("double")),
          lit(0.0),
          (acc, c) => acc + c * log(c)) / size(t).cast("double"))
      .otherwise(lit(0.0))

  private def maxFreqHof(t: Column): Column =
    when(size(t) > 0,
      array_max(transform(array_distinct(t),
        x => size(filter(t, y => y === x)))).cast("double")
        / size(t).cast("double"))
      .otherwise(lit(0.0))

  test("bit-parity with the interpreted HOF chains on randomized token arrays") {
    import spark.implicits._
    val vocab = Vector("a", "b", "spam", "the", "ü", "日本", "🎉", "x1",
      "", " ", "A", "zz", "Zz", "０", "0")
    val rnd = new scala.util.Random(11)
    val arrays: Seq[Seq[String]] =
      Seq(Seq.empty[String], Seq("only"), Seq("s", "s", "s")) ++
        (1 to 300).map { _ =>
          (0 until rnd.nextInt(40)).map(_ => vocab(rnd.nextInt(vocab.length)))
        }
    val df = arrays.zipWithIndex.map { case (a, i) => (i.toLong, a) }
      .toDF("id", "toks").repartition(3)
    val t = col("toks")
    val rows = df.select(col("id"),
      graft.text.TextMetrics.tokenEntropyFromTokens(t).as("ke"),
      entropyHof(t).as("he"),
      element_at(graft.plans.TokenDistStats(t), 2).as("km"),
      maxFreqHof(t).as("hm")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"entropy bits diverged for id=${r.getLong(0)}: " +
          s"${r.getDouble(1)} vs ${r.getDouble(2)}")
      assert(java.lang.Double.doubleToLongBits(r.getDouble(3)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(4)),
        s"max-freq bits diverged for id=${r.getLong(0)}")
    }
  }

  test("null token array coalesces to 0.0 like the old when-guard") {
    import spark.implicits._
    val df = Seq((1L, Seq("a", "a")), (2L, null: Seq[String])).toDF("id", "toks")
    val rows = df.select(col("id"),
      graft.text.TextMetrics.tokenEntropyFromTokens(col("toks")).as("e"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rows(1L) === 0.0) // two identical tokens: H = 0
    assert(rows(2L) === 0.0) // null array -> old otherwise(0.0) behavior
  }

  test("linear on the distinct-token flood that was quadratic interpreted") {
    // 150k UNIQUE tokens: the HOF chain's inner filter rescans the
    // array per distinct token (~2.25e10 comparisons — minutes); the
    // kernel sorts once. Driver-side eval keeps the bound tight.
    val toks = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array.tabulate(150000)(i =>
        org.apache.spark.unsafe.types.UTF8String.fromString("w" + i)))
    val t0 = System.nanoTime()
    val out = graft.plans.TokenDistStats.stats(toks)
    val ms = (System.nanoTime() - t0) / 1e6
    assert(ms < 1000.0, f"kernel took $ms%.0f ms on the distinct flood")
    assert(math.abs(out.getDouble(0) - math.log(150000.0)) < 1e-9)
    assert(out.getDouble(1) === 1.0 / 150000.0)
  }

  test("null ELEMENTS are skipped, not an NPE (external-SQL contract)") {
    // tokens() never yields null elements, but token_dist_stats is a
    // registered SQL function any user query can call; [a, null, a]
    // must behave as [a, a], and an all-null array as empty.
    val mixed = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array(org.apache.spark.unsafe.types.UTF8String.fromString("a"), null,
        org.apache.spark.unsafe.types.UTF8String.fromString("a")))
    val out = graft.plans.TokenDistStats.stats(mixed)
    assert(out.getDouble(0) === 0.0) // two identical tokens: H = 0
    assert(out.getDouble(1) === 1.0)
    val allNull = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array[org.apache.spark.unsafe.types.UTF8String](null, null))
    val empty = graft.plans.TokenDistStats.stats(allNull)
    assert(empty.getDouble(0) === 0.0 && empty.getDouble(1) === 0.0)
  }

  test("wrong-typed SQL call fails at analysis, not execution") {
    graft.plans.GraftFunctions.register(spark)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT token_dist_stats(42)").collect()
    }
    assert(e.getMessage.toLowerCase.contains("type"))
  }
}
