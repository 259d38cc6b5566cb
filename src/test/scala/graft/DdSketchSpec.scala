package graft

import org.apache.spark.sql.functions._

import graft.ops.DdSketch

/** DDSketch aggregator pins: the ≤α relative-error guarantee against
  * exact sorted ranks, the partition-order-proof identity (bucket
  * counts ADD — a repartition cannot move a single count), the
  * zero/negative domain split, and merge commutativity.
  */
class DdSketchSpec extends SparkTestBase {

  private val alpha = DdSketch.DefaultAlpha

  /** Exact quantile with the sketch's own rank convention. */
  private def exactQ(sorted: IndexedSeq[Double], q: Double): Double =
    sorted((math.floor(q * (sorted.length - 1)).toLong + 1L).toInt - 1)

  test("relative error within alpha on a heavy-tailed fixture") {
    import spark.implicits._
    // deterministic log-uniform spread over 4 decades — the document
    // length shape percentile reports actually face
    val vals = (0 until 4000).map { i =>
      math.pow(10.0, 1.0 + 4.0 * ((i * 2654435761L % 4000) / 4000.0))
    }
    val out = vals.toDF("v").as[Double]
      .groupByKey(_ => 1)
      .agg(DdSketch.quantiles().toColumn)
      .collect().head._2
    val sorted = vals.sorted.toIndexedSeq
    assert(out.n === vals.length)
    Seq(out.p50 -> 0.50, out.p90 -> 0.90, out.p99 -> 0.99).foreach {
      case (est, q) =>
        val exact = exactQ(sorted, q)
        assert(math.abs(est - exact) / exact <= alpha + 1e-9,
          s"p$q: est=$est exact=$exact")
    }
  }

  test("partition-order-proof: 1 vs 13 partitions, bit-identical output") {
    import spark.implicits._
    val vals = (0 until 3000).map(i => ((i * 48271) % 977).toDouble - 100.0)
    def run(parts: Int) = vals.toDF("v").repartition(parts).as[Double]
      .groupByKey(_ => 1)
      .agg(DdSketch.quantiles().toColumn)
      .collect().head._2
    assert(run(1) === run(13))
  }

  test("zeros and negatives: rank walk crosses the domain split") {
    import spark.implicits._
    // 30 negatives (-30..-1), 40 zeros, 30 positives (1..30)
    val vals = (-30 to -1).map(_.toDouble) ++ Seq.fill(40)(0.0) ++
      (1 to 30).map(_.toDouble)
    val out = vals.toDF("v").as[Double]
      .groupByKey(_ => 1)
      .agg(DdSketch.quantiles().toColumn)
      .collect().head._2
    assert(out.n === 100L)
    assert(out.p50 === 0.0, "median sits in the zero run")
    // rank floor(0.9*99)+1 = 90 -> the 20th positive value
    assert(math.abs(out.p90 - 20.0) / 20.0 <= alpha + 1e-9)
    // NaN is dropped, not propagated
    val withNan = (vals :+ Double.NaN).toDF("v").as[Double]
      .groupByKey(_ => 1).agg(DdSketch.quantiles().toColumn)
      .collect().head._2
    assert(withNan.n === 100L)
  }

  test("merge is commutative on disjoint and overlapping buffers") {
    val agg = DdSketch.quantiles()
    // merge may mutate its larger argument (the in-partition fast
    // path), so each call gets freshly built buffers
    def a() = Seq(1.0, 5.0, 5.0, -2.0, 0.0).foldLeft(agg.zero)(agg.reduce)
    def b() = Seq(5.0, 1000.0, 0.0).foldLeft(agg.zero)(agg.reduce)
    assert(agg.merge(a(), b()) === agg.merge(b(), a()))
    assert(agg.finish(agg.merge(a(), b())).n === 8L)
    // an immutable (post-deserialization-shaped) buffer merges too
    val frozen = {
      val x = a()
      x.copy(pos = x.pos.toMap, neg = x.neg.toMap)
    }
    assert(agg.merge(frozen, b()) === agg.merge(a(), b()))
  }

  test("buckets view: same sketch as quantiles, exploded and exactly countable") {
    val qAgg = DdSketch.quantiles()
    val bAgg = DdSketch.buckets()
    val xs = Seq(1.0, 5.0, 5.0, 5.05, -2.0, 0.0, 0.0, 1000.0, 0.25)
    val qBuf = xs.foldLeft(qAgg.zero)(qAgg.reduce)
    val bBuf = xs.foldLeft(bAgg.zero)(bAgg.reduce)
    // one algebra, two finishers: the buffers are identical
    assert(qBuf === bBuf)
    val bs = bAgg.finish(bBuf)
    // deterministic (kind, idx) order: neg desc-magnitude? no — neg
    // ascending idx, then zero, then pos ascending idx
    assert(bs === bs.sortBy(b =>
      (Seq("neg", "zero", "pos").indexOf(b.kind), b.idx)))
    // counts are exact (no estimation in this view): total = n, the
    // two 5.0s share a bucket with 5.05 (same gamma-bucket at α=0.01
    // ⇒ within 2% relative), zeros counted apart
    assert(bs.map(_.cnt).sum === xs.length.toLong)
    assert(bs.find(_.kind == "zero").map(_.cnt) === Some(2L))
    assert(bs.count(_.kind == "neg") === 1)
    val fives = bs.filter(b => b.kind == "pos" &&
      b.idx == math.ceil(math.log(5.0) / math.log(1.02020202020202)).toInt)
    assert(fives.map(_.cnt).sum === 3L)
    // and the quantile finisher sees the same mass
    assert(qAgg.finish(qBuf).n === xs.length.toLong)
  }
}
