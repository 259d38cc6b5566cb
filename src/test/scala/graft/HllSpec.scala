package graft

import org.apache.spark.sql.functions._

import graft.ops.Hll

/** Contract for the oracle-checkable md5 HyperLogLog (the q_hll_shards
  * graded twin): group independence (the regression that motivated the
  * copy-on-upgrade map buffer — a BINARY buffer aliased the shared
  * zero literal and every group converged to the global union),
  * shard-merge == flat-build, estimate accuracy vs exact distinct, and
  * engine-vs-JVM hash parity.
  */
class HllSpec extends SparkTestBase {

  import spark.implicits._

  test("per-group registers are independent (BINARY-buffer aliasing regression)") {
    val data = Seq(("a", 1L << 48), ("a", 2L << 48), ("b", 3L << 48))
      .toDF("g", "h").as[(String, Long)]
    val r = data.groupByKey(_._1).mapValues(_._2)
      .agg(Hll.registers.toColumn).collect().toMap
    assert(r("a").size === 2)
    assert(r("b").size === 1, "group b absorbed group a's registers")
  }

  test("hash60 equals a JVM MessageDigest fold") {
    val words = Seq("the", "quick", "émigré", "小舟", "", "a b")
    val got = words.toDF("w").select(Hll.hash60(col("w"))).collect()
      .map(_.getLong(0))
    val want = words.map { w =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8"))
      val hex = d.map(b => f"$b%02x").mkString.take(Hll.HashHexChars)
      java.lang.Long.parseLong(hex, 16)
    }
    assert(got.toSeq === want)
  }

  test("two-level shard merge is bit-identical to the flat build") {
    val rnd = new scala.util.Random(99L)
    val rows = (0 until 3000).map { i =>
      val g = s"g${i % 3}"
      val h = rnd.nextLong() >>> 4 // 60-bit
      (g, h, h % 8)
    }
    val ds = rows.toDF("g", "h", "s").as[(String, Long, Long)]
    val flat = ds.map(r => (r._1, r._2)).groupByKey(_._1).mapValues(_._2)
      .agg(Hll.registers.toColumn).collect().toMap
    val l1 = ds.groupByKey(r => (r._1, r._3)).mapValues(_._2)
      .agg(Hll.registers.toColumn)
    val twoLevel = l1.map { case ((g, _), regs) => (g, regs) }
      .groupByKey(_._1).mapValues(_._2)
      .agg(Hll.mergeRegisters.toColumn).collect().toMap
    assert(twoLevel === flat)
  }

  test("estimate within HLL error bounds on known cardinalities") {
    // m=4096 -> typical relative error 1.04/sqrt(m) ~ 1.6%; allow 3 sigma
    Seq(100, 2000, 20000).foreach { n =>
      val keys = (0 until n).map(i => s"key-$i")
      val regs = keys.toDF("w").select(Hll.hash60(col("w")).as("h"))
        .withColumn("g", lit("x")).as[(Long, String)]
        .groupByKey(_._2).mapValues(_._1)
        .agg(Hll.registers.toColumn).collect().head._2
      val est = Hll.estimate(regs).est_q / 100.0
      val err = math.abs(est - n) / n.toDouble
      assert(err < 0.05, s"n=$n est=$est err=$err")
    }
  }

  test("estimate is partition-order-proof") {
    val keys = (0 until 5000).map(i => (s"k$i", "g"))
    def run(parts: Int) =
      keys.toDF("w", "g").repartition(parts, col("w"))
        .select(col("g"), Hll.hash60(col("w")).as("h")).as[(String, Long)]
        .groupByKey(_._1).mapValues(_._2)
        .agg(Hll.registers.toColumn).collect().head._2
    assert(run(1) === run(13))
  }

  test("incremental state merge equals the flat build, incl. one-sided groups") {
    def state(rows: Seq[(String, String)]) =
      rows.toDF("g", "w").select(col("g"), Hll.hash60(col("w")).as("h"))
        .as[(String, Long)].groupByKey(_._1).mapValues(_._2)
        .agg(Hll.registers.toColumn).toDF("g", "regs")
    // batch 1: groups a+b; batch 2: groups b+c (a quiet, c new) + overlap
    val b1 = (0 until 400).map(i => ("a", s"x$i")) ++
      (0 until 300).map(i => ("b", s"y$i"))
    val b2 = (100 until 500).map(i => ("b", s"y$i")) ++
      (0 until 200).map(i => ("c", s"z$i"))
    val merged = graft.ops.Incremental
      .mergeHllStates(state(b1), state(b2))
      .as[(String, Map[Int, Int])].collect().toMap
    val flat = state(b1 ++ b2).as[(String, Map[Int, Int])].collect().toMap
    assert(merged == flat)
    // and mergeMaps alone: idempotent, commutative, empty-identity
    val r = flat("b")
    assert(Hll.mergeMaps(r, r) == r)
    assert(Hll.mergeMaps(Map.empty, r) == r)
    assert(Hll.mergeMaps(flat("a"), flat("c")) == Hll.mergeMaps(flat("c"), flat("a")))
  }
}
