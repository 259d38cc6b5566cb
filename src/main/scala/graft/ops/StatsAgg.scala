package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (`org.apache.spark.sql.expressions.Aggregator`):
  * count / mean / population variance in one pass.
  *
  * The buffer holds exact integer sums of 1e2-quantized values (sum and
  * sum of squares), so merge order cannot perturb the result — the same
  * engine-portability property TpchQueries.decSum gives plain sums,
  * extended to second moments. Long-range check: |value| ≤ ~1e6 and
  * ~1e9 rows per group fit sumsq in a signed 64-bit long.
  *
  * Variance uses the E[X²]−E[X]² identity on the exact sums — the usual
  * catastrophic-cancellation hazard of that identity does not apply
  * because the sums are integers (no accumulated rounding), and the
  * final few double ops are in fixed order on every engine.
  */
object StatsAgg {

  private val Q = 100.0

  case class Buf(n: Long, sum: Long, sumSq: Long)
  case class Stats(n: Long, mean: Double, varPop: Double)

  val quantizedStats: Aggregator[Double, Buf, Stats] =
    new Aggregator[Double, Buf, Stats] {
      override def zero: Buf = Buf(0L, 0L, 0L)
      override def reduce(b: Buf, x: Double): Buf = {
        val q = math.floor(x * Q).toLong
        Buf(b.n + 1, b.sum + q, b.sumSq + q * q)
      }
      override def merge(a: Buf, b: Buf): Buf =
        Buf(a.n + b.n, a.sum + b.sum, a.sumSq + b.sumSq)
      override def finish(b: Buf): Stats =
        if (b.n == 0) Stats(0L, 0.0, 0.0)
        else {
          val mean = b.sum / Q / b.n
          val meanSq = b.sumSq / (Q * Q) / b.n
          Stats(b.n, mean, meanSq - mean * mean)
        }
      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Stats] = Encoders.product[Stats]
    }
}
