package graft

import org.apache.spark.sql.functions._

import graft.ops.Funnel

/** Sequential funnel + cohort retention: ordering semantics that the
  * one-row oracle totals can't distinguish on their own.
  */
class FunnelSpec extends SparkTestBase {

  private def ev(rows: (Long, String, Long)*) = {
    import spark.implicits._
    rows.toDF("user_id", "event_type", "us")
  }

  test("funnel: steps must occur strictly after the previous step") {
    val df = ev(
      // user 1: full ordered funnel
      (1L, "signup", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      // user 2: click BEFORE signup -> falls out at step 2
      (2L, "click", 5L), (2L, "signup", 10L), (2L, "purchase", 40L),
      // user 3: click at the SAME instant as signup -> strict '>' drops it
      (3L, "signup", 10L), (3L, "click", 10L),
      // user 4: signup only
      (4L, "signup", 99L),
      // user 5: never signed up -> not even step 1
      (5L, "click", 1L), (5L, "purchase", 2L))
    val out = Funnel.sequentialFunnel(df, Seq("signup", "click", "purchase"))
      .collect().head
    assert(out.getAs[Long]("n_step_1") === 4L)
    assert(out.getAs[Long]("n_step_2") === 1L)
    assert(out.getAs[Long]("n_step_3") === 1L)
  }

  test("funnel: earliest qualifying occurrence chains, not the global min") {
    // user's FIRST click precedes signup, but a later click qualifies —
    // the step time must be min over qualifying events, not all events
    val df = ev(
      (1L, "click", 1L), (1L, "signup", 10L),
      (1L, "click", 20L), (1L, "purchase", 25L))
    val out = Funnel.sequentialFunnel(df, Seq("signup", "click", "purchase"))
      .collect().head
    assert(out.getAs[Long]("n_step_2") === 1L)
    assert(out.getAs[Long]("n_step_3") === 1L)
  }

  test("cohort retention: offsets count from each user's first period") {
    import spark.implicits._
    val act = Seq(
      (1L, 0L), (1L, 7L), (1L, 14L),  // cohort 0, active 3 periods
      (2L, 7L), (2L, 21L),            // cohort 7, offsets 0 and 2
      (3L, 0L), (3L, 0L))             // duplicate activity collapses
      .toDF("user_id", "week")
    val out = Funnel.cohortRetention(act, "user_id", "week",
        (w, c) => ((w - c) / 7).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out((0L, 0L)) === 2L) // users 1 and 3
    assert(out((0L, 1L)) === 1L)
    assert(out((0L, 2L)) === 1L)
    assert(out((7L, 0L)) === 1L)
    assert(out((7L, 2L)) === 1L)
    assert(!out.contains((7L, 1L)))
  }
}
