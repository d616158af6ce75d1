package graft

import java.sql.Timestamp
import graft.queries.Series
import org.apache.spark.sql.functions._

/** B15 [[Series.seriesPairs]]: exact integer day-series distances,
  * zero-fill of missing days, the eps boundary, and the total-sum
  * grid blocking's losslessness against brute force. */
class SeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ev(u: Long, day: Int, v: Double) =
    (u, Timestamp.valueOf(f"2024-01-${day + 1}%02d 10:00:00"), v)

  test("identical and near series match; distances are exact cents^2") {
    val events = Seq(
      ev(1L, 0, 10.0), ev(1L, 2, 5.0),           // series (1000, 0, 500)
      ev(2L, 0, 10.0), ev(2L, 2, 5.0),           // identical -> dist 0
      ev(3L, 0, 10.0), ev(3L, 2, 5.5),           // differs by 50 cents day 2
      ev(4L, 1, 100.0))                          // far away
      .toDF("user_id", "ts", "value")
    val out = Series.seriesPairs(events, eps = 10000L).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out((1L, 2L)) == 0L, s"identical series: $out")
    assert(out((1L, 3L)) == 2500L && out((2L, 3L)) == 2500L,
      s"50-cent day-2 gap -> 50^2: $out")
    assert(!out.keySet.exists(p => p._1 == 4L || p._2 == 4L),
      "the far series must not match")
    // missing days zero-fill: user 4 vs an all-quiet twin would be the
    // sum of its own squares — plant user 5 with no overlap
    val out2 = Series.seriesPairs(
      (Seq(ev(4L, 1, 100.0), ev(5L, 0, 0.01))).toDF("user_id", "ts", "value"),
      eps = 200000000L).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out2((4L, 5L)) == 10000L * 10000L + 1L * 1L, s"zero-fill: $out2")
  }

  test("grid blocking equals brute force, including near-boundary totals") {
    // eps 10000 -> over L=2 days W = ceil(sqrt(2e4)) = 142: craft totals
    // straddling a cell edge but within eps, plus decoys beyond eps
    val events = Seq(
      ev(1L, 0, 1.00), ev(1L, 1, 0.50),  // total 150 cents
      ev(2L, 0, 1.40), ev(2L, 1, 0.99),  // total 239 — other cell, within eps
      ev(3L, 0, 2.00), ev(3L, 1, 2.00),  // total 400
      ev(4L, 0, 9.00), ev(4L, 1, 9.00))  // far
      .toDF("user_id", "ts", "value")
    val blocked = Series.seriesPairs(events, eps = 10000L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute force locally
    val cents = Map(1L -> Seq(100L, 50L), 2L -> Seq(140L, 99L),
      3L -> Seq(200L, 200L), 4L -> Seq(900L, 900L))
    val brute = (for {
      a <- cents.keys; b <- cents.keys if a < b
      d2 = cents(a).zip(cents(b)).map { case (x, y) => (x - y) * (x - y) }.sum
      if d2 <= 10000L
    } yield (a, b, d2)).toSet
    assert(blocked == brute, s"blocked $blocked vs brute $brute")
    assert(brute.contains((1L, 2L, 1600L + 2401L)), "the boundary pair")
    intercept[IllegalArgumentException](Series.seriesPairs(events, 0L))
  }
}
