package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** DDSketch-style relative-error quantile sketch as a typed
  * `Aggregator` (Masson, Lee & Rim, VLDB 2019) — the mergeable
  * percentile path for corpus-scale reporting, where the exact
  * two-pass rank machinery (`q_order_quartiles`) or a full
  * `percentile` sort-agg is a luxury: every group's sketch is
  * O(log_γ(max/min)) counters no matter how many rows feed it, and
  * map-side partial aggregation does the heavy lifting.
  *
  * Why THIS sketch and not GK/KLL/t-digest: bucket counts ADD. The
  * bucket of a value is a pure function of the value
  * (⌈ln x / ln γ⌉), so reduce and merge are commutative and
  * associative — the sketch is PARTITION-ORDER-PROOF, the same
  * determinism discipline as the engine's quantized integer sums
  * (StatsAgg, TopK). GK/KLL/t-digest all make compaction decisions
  * that depend on arrival/merge order and would flutter across
  * repartitionings; here a repartition cannot move a single count.
  *
  * Guarantee: for any quantile, the estimate's RELATIVE error vs the
  * true value is ≤ α (each bucket spans [γ^(i−1), γ^i] and reports
  * its midpoint-in-log-space 2γ^i/(γ+1), within α of every value in
  * the bucket). Zeros get a dedicated counter; negative inputs use a
  * mirrored bucket map, so the domain is all finite doubles.
  *
  * The bucket map stays unbounded here (log_γ spans the full double
  * range in ≲ 15k buckets at α = 0.01 — 120 KB worst case, fixtures
  * use ≲ 200); production DDSketch's lowest-bucket-collapse knob can
  * bolt on without changing the merge algebra.
  */
object DdSketch {

  val DefaultAlpha = 0.01

  /** Buffer maps are typed `collection.Map` so the HOT path can mutate:
    * within a partition the buffer holds a `mutable.HashMap` and
    * reduce() updates it in place (one hash probe per row, zero
    * allocation) — a per-row immutable `updated` would rebuild a HAMT
    * path per document on the exact map-side-partial path the sketch
    * exists to keep cheap. Only at exchange boundaries does the
    * encoder materialize (and deserialize back) an immutable map, and
    * reduce/merge upgrade such a buffer to mutable exactly once.
    */
  case class Buf(pos: scala.collection.Map[Int, Long],
                 neg: scala.collection.Map[Int, Long], zero: Long)

  case class Quantiles(n: Long, p50: Double, p90: Double, p99: Double)

  /** One sketch bucket in the canonical exploded form: kind ∈
    * {neg, zero, pos}, the log-bucket index (0 for the zero counter),
    * and its count. The ORACLE-CHECKABLE view of the sketch — bucket
    * assignment is a pure function of the value and counts ADD, so a
    * foreign engine can replay the whole sketch as a GROUP BY over
    * the same ceil(ln·/ln γ) arithmetic (what `q_dd_buckets` does),
    * proving assignment and the distributed merge end-to-end.
    */
  case class Bucket(kind: String, idx: Int, cnt: Long)

  /** Bucket index of a positive magnitude: ⌈ln x / ln γ⌉. */
  private def bucketIdx(x: Double, logGamma: Double): Int =
    math.ceil(math.log(x) / logGamma).toInt

  private type MMap = scala.collection.mutable.HashMap[Int, Long]

  private def bump(m: MMap, k: Int, v: Long): Unit =
    m.update(k, m.getOrElse(k, 0L) + v)

  /** The map as a mutable HashMap — itself when already mutable (the
    * in-partition case), else a one-time copy (post-deserialization).
    */
  private def asMutable(m: scala.collection.Map[Int, Long]): MMap = m match {
    case hm: MMap @unchecked => hm
    case other =>
      val hm = new scala.collection.mutable.HashMap[Int, Long](
        other.size * 2 + 8, scala.collection.mutable.HashMap.defaultLoadFactor)
      other.foreach { case (k, v) => hm.update(k, v) }
      hm
  }

  /** The shared sketch algebra — zero/reduce/merge identical for every
    * finisher, so the quantile reporter and the oracle-checkable bucket
    * exploder are provably the SAME sketch (one build path, two views).
    */
  private abstract class SketchAgg[O](alpha: Double)
      extends Aggregator[Double, Buf, O] {
    protected val gamma: Double = (1.0 + alpha) / (1.0 - alpha)
    protected val logGamma: Double = math.log(gamma)

    protected def bucket(x: Double): Int = bucketIdx(x, logGamma)

    override def zero: Buf =
      Buf(new scala.collection.mutable.HashMap[Int, Long](),
        new scala.collection.mutable.HashMap[Int, Long](), 0L)

    override def reduce(b: Buf, x: Double): Buf =
      if (x.isNaN) b
      else if (x > 0.0) {
        val m = asMutable(b.pos)
        bump(m, bucket(x), 1L)
        if (m eq b.pos) b else b.copy(pos = m)
      } else if (x < 0.0) {
        val m = asMutable(b.neg)
        bump(m, bucket(-x), 1L)
        if (m eq b.neg) b else b.copy(neg = m)
      } else b.copy(zero = b.zero + 1L)

    override def merge(a: Buf, b: Buf): Buf = {
      // fold the smaller side into the larger one's mutable form
      val (big, small) =
        if (a.pos.size + a.neg.size >= b.pos.size + b.neg.size) (a, b)
        else (b, a)
      val pos = asMutable(big.pos)
      val neg = asMutable(big.neg)
      small.pos.foreach { case (k, v) => bump(pos, k, v) }
      small.neg.foreach { case (k, v) => bump(neg, k, v) }
      Buf(pos, neg, a.zero + b.zero)
    }

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  }

  /** Sketch of doubles; finish() reports n and the 50/90/99th
    * percentile estimates (the report-card set).
    */
  def quantiles(alpha: Double = DefaultAlpha): Aggregator[Double, Buf, Quantiles] =
    new SketchAgg[Quantiles](alpha) {
      private def value(i: Int): Double =
        2.0 * math.pow(gamma, i) / (gamma + 1.0)

      /** Rank walk in value order: negatives from the largest-magnitude
        * bucket down, then zeros, then positives ascending.
        */
      private def estimate(b: Buf, n: Long, q: Double): Double = {
        // 1-based target rank, clamped; same convention as DDSketch's
        // reference implementation (rank = floor(q * (n - 1)) + 1)
        val target = math.floor(q * (n - 1)).toLong + 1L
        var acc = 0L
        for ((i, c) <- b.neg.toSeq.sortBy(-_._1)) {
          acc += c
          if (acc >= target) return -value(i)
        }
        acc += b.zero
        if (acc >= target) return 0.0
        for ((i, c) <- b.pos.toSeq.sortBy(_._1)) {
          acc += c
          if (acc >= target) return value(i)
        }
        0.0 // unreachable for n > 0
      }

      override def finish(b: Buf): Quantiles = {
        val n = b.zero + b.pos.valuesIterator.sum + b.neg.valuesIterator.sum
        if (n == 0L) Quantiles(0L, 0.0, 0.0, 0.0)
        else Quantiles(n, estimate(b, n, 0.50), estimate(b, n, 0.90),
          estimate(b, n, 0.99))
      }

      override def outputEncoder: Encoder[Quantiles] = Encoders.product[Quantiles]
    }

  /** Same sketch, exploded view: finish() returns every bucket as a
    * [[Bucket]] row in deterministic (kind, idx) order. This is the
    * oracle gate for the sketch — DuckDB replays bucket assignment as
    * `ceil(ln(v) / ln γ)` and the merge as a plain GROUP-BY count, so
    * a wrong bucket function, a dropped map-side partial, or a merge
    * slip is a hash mismatch (`q_dd_buckets`). The quantile reporter
    * above shares zero/reduce/merge through [[SketchAgg]], so the
    * check covers its sketch-building path transitively.
    */
  def buckets(alpha: Double = DefaultAlpha): Aggregator[Double, Buf, Seq[Bucket]] =
    new SketchAgg[Seq[Bucket]](alpha) {
      override def finish(b: Buf): Seq[Bucket] = {
        val neg = b.neg.toSeq.sortBy(_._1)
          .map { case (i, c) => Bucket("neg", i, c) }
        val zero = if (b.zero > 0L) Seq(Bucket("zero", 0, b.zero)) else Nil
        val pos = b.pos.toSeq.sortBy(_._1)
          .map { case (i, c) => Bucket("pos", i, c) }
        neg ++ zero ++ pos
      }

      override def outputEncoder: Encoder[Seq[Bucket]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Bucket]]()
    }
}
