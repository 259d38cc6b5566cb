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

  case class Buf(pos: Map[Int, Long], neg: Map[Int, Long], zero: Long)

  case class Quantiles(n: Long, p50: Double, p90: Double, p99: Double)

  private def addTo(m: Map[Int, Long], k: Int): Map[Int, Long] =
    m.updated(k, m.getOrElse(k, 0L) + 1L)

  private def mergeMaps(a: Map[Int, Long], b: Map[Int, Long]): Map[Int, Long] =
    if (a.size < b.size) mergeMaps(b, a)
    else b.foldLeft(a) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0L) + v) }

  /** Sketch of doubles; finish() reports n and the 50/90/99th
    * percentile estimates (the report-card set).
    */
  def quantiles(alpha: Double = DefaultAlpha): Aggregator[Double, Buf, Quantiles] =
    new Aggregator[Double, Buf, Quantiles] {
      private val gamma = (1.0 + alpha) / (1.0 - alpha)
      private val logGamma = math.log(gamma)

      private def bucket(x: Double): Int = math.ceil(math.log(x) / logGamma).toInt
      private def value(i: Int): Double =
        2.0 * math.pow(gamma, i) / (gamma + 1.0)

      override def zero: Buf = Buf(Map.empty, Map.empty, 0L)

      override def reduce(b: Buf, x: Double): Buf =
        if (x.isNaN) b
        else if (x > 0.0) b.copy(pos = addTo(b.pos, bucket(x)))
        else if (x < 0.0) b.copy(neg = addTo(b.neg, bucket(-x)))
        else b.copy(zero = b.zero + 1L)

      override def merge(a: Buf, b: Buf): Buf =
        Buf(mergeMaps(a.pos, b.pos), mergeMaps(a.neg, b.neg), a.zero + b.zero)

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

      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Quantiles] = Encoders.product[Quantiles]
    }
}
