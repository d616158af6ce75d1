package graft

import java.sql.Timestamp
import graft.queries.Funnels

/** B12/B13 [[Funnels]] on planted event streams: strict-order funnel
  * semantics (a click BEFORE the user's first view does not convert;
  * an equal timestamp does not convert) and integer-week cohort math. */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("funnel counts strictly ordered completions per user") {
    val events = Seq(
      // user 1: full conversion in order
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:05:00"), "click"),
      (1L, ts("2024-01-01 10:10:00"), "purchase"),
      // user 2: click only BEFORE the first view -> stops at step 1
      (2L, ts("2024-01-01 09:00:00"), "click"),
      (2L, ts("2024-01-01 10:00:00"), "view"),
      // user 3: view + click, no purchase
      (3L, ts("2024-01-01 10:00:00"), "view"),
      (3L, ts("2024-01-01 11:00:00"), "click"),
      // user 4: purchase with no view -> never enters
      (4L, ts("2024-01-01 10:00:00"), "purchase"),
      // user 5: click at EXACTLY the first-view instant -> strict >, no convert
      (5L, ts("2024-01-01 10:00:00"), "view"),
      (5L, ts("2024-01-01 10:00:00"), "click"))
      .toDF("user_id", "ts", "event_type")
    val out = Funnels.funnel(events).collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1L, "view", 4L), (2L, "click", 2L), (3L, "purchase", 1L)), out.toSeq)
    assert(out.map(_.getDouble(3)).toSeq == Seq(1.0, 0.5, 0.25))
  }

  test("funnel conversion resets from the FIRST completion of the prior step") {
    // user's first view is early; a click between first and second view counts
    val events = Seq(
      (1L, ts("2024-01-01 08:00:00"), "view"),
      (1L, ts("2024-01-01 09:00:00"), "click"),
      (1L, ts("2024-01-01 10:00:00"), "view"))
      .toDF("user_id", "ts", "event_type")
    val out = Funnels.funnel(events, Seq("view", "click")).collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 1L))
    intercept[IllegalArgumentException](Funnels.funnel(events, Seq()))
    intercept[IllegalArgumentException](Funnels.funnel(events, Seq("a", "a")))
  }

  test("transitions count per-user adjacencies and row-normalize") {
    val events = Seq(
      (0L, 1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, 1L, ts("2024-01-01 10:01:00"), "click"),
      (2L, 1L, ts("2024-01-01 10:02:00"), "view"),
      (3L, 1L, ts("2024-01-01 10:03:00"), "purchase"),
      (4L, 2L, ts("2024-01-01 10:00:00"), "view"),
      (5L, 2L, ts("2024-01-01 10:01:00"), "click"),
      // user boundary: no transition from u1's purchase to u2's view
      (6L, 3L, ts("2024-01-01 10:00:00"), "view"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val out = Funnels.transitions(events).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out.keySet ==
      Set(("view", "click"), ("click", "view"), ("view", "purchase")),
      out.keySet)
    assert(out(("view", "click")) == ((2L, 2.0 / 3)), out)
    assert(out(("view", "purchase")) == ((1L, 1.0 / 3)))
    assert(out(("click", "view")) == ((1L, 1.0)))
  }

  test("retention buckets by integer epoch-weeks of the first event") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),   // epoch day 19723, wk 2817
      (1L, ts("2024-01-09 10:00:00"), "click"),  // +8 days -> offset 1
      (1L, ts("2024-01-21 10:00:00"), "view"),   // +20 days -> offset 2
      (1L, ts("2024-01-02 10:00:00"), "view"),   // +1 day  -> offset 0 again
      (2L, ts("2024-01-10 10:00:00"), "view"))   // epoch day 19732, wk 2818
      .toDF("user_id", "ts", "event_type")
    val out = Funnels.retention(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val wk1 = java.time.LocalDate.of(2024, 1, 1).toEpochDay / 7
    val wk2 = java.time.LocalDate.of(2024, 1, 10).toEpochDay / 7
    assert(out == Seq((wk1, 0L, 1L), (wk1, 1L, 1L), (wk1, 2L, 1L), (wk2, 0L, 1L)),
      s"got $out, cohorts $wk1/$wk2")
  }
}
