package graft

import java.sql.Timestamp

import graft.ops.AsOfJoin

/** Backward as-of join semantics on a hand-computable fixture. */
class AsOfJoinSpec extends SparkTestBase {

  private def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")

  test("attaches latest right row at-or-before; null when none; per key") {
    import spark.implicits._
    val left = Seq(
      (1L, 7L, ts(10)),  // after clicks at 5 and 9 -> pick 9
      (2L, 7L, ts(5)),   // exactly at click 5 -> inclusive, pick 5
      (3L, 7L, ts(1)),   // before any click -> null
      (4L, 8L, ts(30))   // other user, no clicks at all -> null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (7L, ts(5), 100.0),
      (7L, ts(9), 200.0),
      (9L, ts(1), 999.0)  // different key, never visible
    ).toDF("user_id", "ts", "click_value")

    val got = AsOfJoin.asofBackward(left, right, "user_id", "ts", Seq("click_value"))
      .select("event_id", "click_value").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(got === Map(
      1L -> Some(200.0), 2L -> Some(100.0), 3L -> None, 4L -> None))
  }

  test("rejects colliding payload column names") {
    import spark.implicits._
    val l = Seq((1L, 1L, ts(0), 5.0)).toDF("event_id", "user_id", "ts", "v")
    val r = Seq((1L, ts(0), 1.0)).toDF("user_id", "ts", "v")
    assertThrows[IllegalArgumentException] {
      AsOfJoin.asofBackward(l, r, "user_id", "ts", Seq("v"))
    }
  }
}
