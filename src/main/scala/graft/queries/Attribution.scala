package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Click→purchase attribution (SURVEY.md §2 G8 batch form) — the
  * canonical event-correlation interval join: every purchase joins the
  * same user's clicks in the preceding [[WindowMin]] minutes, reporting
  * how many touches led to it and which click gets last-touch credit.
  * The batch form is the DuckDB-checked oracle; the streaming form
  * ([[graft.streaming.Streams.clickToPurchase]]) runs the SAME
  * interval condition (`c.ts ≤ p.ts ≤ c.ts + W` ⟺ clicks in the W
  * before the purchase) as a watermarked stream–stream join and must
  * emit exactly the batch pairs (differential spec).
  *
  * Scale shape: one equi-join keyed on user_id with the time window as
  * a residual predicate — at 100 TB the range condition prunes inside
  * each user's hash bucket, and the per-purchase aggregation is
  * map-side combinable. Last-touch pick is `max(struct(ts, id))` —
  * total order, deterministic under ts ties.
  */
object Attribution {

  /** Attribution window (minutes). */
  val WindowMin = 10

  /** Per-purchase attribution over an events frame:
    * (purchase_id, user_id, purchase_ts, n_clicks, last_click_id),
    * last_click_id = −1 when no click precedes within the window. */
  def attribution(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
    purchases
      .join(clicks,
        purchases("user_id") === clicks("user_id") &&
          col("click_ts") <= col("purchase_ts") &&
          col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $WindowMin MINUTES"),
        "left")
      .groupBy(purchases("user_id"), col("purchase_id"), col("purchase_ts"))
      .agg(
        count(col("click_id")).as("n_clicks"),
        coalesce(
          max(when(col("click_id").isNotNull,
            struct(col("click_ts"), col("click_id"))))
            .getField("click_id"),
          lit(-1L)).as("last_click_id"))
      .select(col("purchase_id"), col("user_id"),
        date_format(col("purchase_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
          .as("purchase_ts"),
        col("n_clicks"), col("last_click_id"))
      .orderBy("purchase_id")
  }

  val qAttribution: Q = Q(
    "q_attribution",
    (s, d) => attribution(Tables.events(s, d)),
    Some(s"""WITH ev AS (
        SELECT event_id, ts::TIMESTAMP AS ts, user_id, event_type FROM events),
      c AS (SELECT user_id, event_id AS cid, ts AS cts FROM ev WHERE event_type = 'click'),
      p AS (SELECT user_id, event_id AS pid, ts AS pts FROM ev WHERE event_type = 'purchase')
      SELECT p.pid AS purchase_id, p.user_id,
        strftime(p.pts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
        count(c.cid) AS n_clicks,
        coalesce(max(CASE WHEN c.cid IS NOT NULL
            THEN struct_pack(t := c.cts, i := c.cid) END).i, -1) AS last_click_id
      FROM p LEFT JOIN c
        ON p.user_id = c.user_id
        AND c.cts <= p.pts
        AND c.cts >= p.pts - INTERVAL $WindowMin MINUTE
      GROUP BY p.pid, p.user_id, p.pts
      ORDER BY purchase_id"""))

  val all: Seq[Q] = Seq(qAttribution)
}
