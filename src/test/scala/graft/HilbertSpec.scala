package graft

import org.apache.spark.sql.functions._

import graft.plans.HilbertKey

/** Hilbert key kernel: inverted by an independently-written d→(x,y)
  * walk (the bottom-up formulation, structurally different from the
  * kernel's top-down walk — a shared misreading would have to hit both
  * directions), unit-step adjacency of consecutive indices, corner
  * anchors, clamping, and SQL-function registration.
  */
class HilbertSpec extends SparkTestBase {
  import spark.implicits._

  /** Independent inverse: the standard bottom-up d2xy. */
  private def d2xy(dIn: Long): (Long, Long) = {
    var t = dIn; var x = 0L; var y = 0L; var s = 1L
    while (s < (1L << HilbertKey.Bits)) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx; y += s * ry
      t /= 4; s *= 2
    }
    (x, y)
  }

  test("kernel inverts d2xy across a seeded sample of the full domain") {
    val rnd = new scala.util.Random(2026)
    (0 until 3000).foreach { _ =>
      val d = (rnd.nextLong() & Long.MaxValue) % (1L << 32)
      val (x, y) = d2xy(d)
      assert(HilbertKey.kernel(x, y) == d, s"d=$d -> ($x,$y)")
    }
  }

  test("consecutive indices are Manhattan-adjacent cells (unit steps)") {
    val rnd = new scala.util.Random(7)
    (0 until 500).foreach { _ =>
      val d = (rnd.nextLong() & Long.MaxValue) % ((1L << 32) - 1)
      val (x1, y1) = d2xy(d)
      val (x2, y2) = d2xy(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1, s"jump at d=$d")
    }
  }

  test("corner anchors and clamping") {
    assert(HilbertKey.kernel(0, 0) == 0L)
    // the curve's last cell: d = 2^32 - 1 lands at (2^16-1, 0)
    assert(HilbertKey.kernel(65535, 0) == (1L << 32) - 1)
    // out-of-range clamps to the edge, nulls (via Column API) to 0
    assert(HilbertKey.kernel(-5, 999999) == HilbertKey.kernel(0, 65535))
    val viaCol = Seq((Option.empty[Long], Some(3L))).toDF("x", "y")
      .select(HilbertKey(col("x"), col("y"))).as[Long].head()
    assert(viaCol == HilbertKey.kernel(0, 3))
  }

  test("registered SQL function matches the Column API") {
    graft.plans.GraftFunctions.register(spark)
    val got = spark.sql("SELECT hilbert_key(CAST(123 AS BIGINT), CAST(456 AS BIGINT))")
      .as[Long].head()
    assert(got == HilbertKey.kernel(123, 456))
  }
}
