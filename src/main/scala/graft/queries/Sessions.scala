package graft.queries

import graft.{Exact, Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics in batch form (SURVEY.md §2 G1–G2). The same
  * semantics run incrementally in [[graft.streaming.Streams]]; these
  * batch plans double as the DuckDB-checkable oracle for them.
  */
object Sessions {
  import Exact._

  /** G1: gap-based sessionization (30 min): a session starts where the
    * gap from the previous event of the same user exceeds the timeout;
    * session id = running count of starts. One shuffle on user_id; both
    * windows and the final group share that partitioning. */
  /** Public API: gap sessionization over any (user_id, ts, value) frame. */
  def sessionize(events: DataFrame, gapMinutes: Long = 30): DataFrame = {
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      val runing = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_s",
          when(col("prev_ts").isNotNull &&
            (unix_micros(col("ts")) - unix_micros(col("prev_ts"))) <= gapMinutes * 60 * 1000000, 0L)
            .otherwise(1L))
        .withColumn("session_idx", sum(col("new_s")).over(runing))
        .groupBy(col("user_id"), col("session_idx"))
        .agg(
          date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
          count(lit(1)).as("n_events"),
          (unix_micros(max(col("ts"))) - unix_micros(min(col("ts")))).as("duration_us"),
          dsum(col("value")).as("total_value"))
        .orderBy("user_id", "session_idx")
  }

  /** G1 via Spark's built-in `session_window` operator — the same gap
    * sessions through Catalyst's native path (which also runs under
    * Structured Streaming with state management for free). Boundary
    * nuance vs [[sessionize]]: the native window is half-open
    * [start, last+gap), so an event at EXACTLY gap distance starts a new
    * session, where the lag-based form merges it; sub-µs timestamps make
    * a real tie vanishingly rare (SessionWindowSpec proves equality on
    * the corpus). */
  def sessionizeNative(events: DataFrame, gapMinutes: Long = 30): DataFrame =
    events
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMinutes minutes").as("w"))
      .agg(
        count(lit(1)).as("n_events"),
        (unix_micros(max(col("ts"))) - unix_micros(min(col("ts")))).as("duration_us"),
        dsum(col("value")).as("total_value"))
      .select(col("user_id"),
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
        col("n_events"), col("duration_us"), col("total_value"))

  val qSessionize: Q = Q(
    "q_sessionize",
    (s, d) => sessionize(Tables.events(s, d)),
    Some(s"""WITH e AS (SELECT user_id, event_id, ts::TIMESTAMP AS ts, value FROM events),
      flags AS (SELECT user_id, ts, value,
        CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                  <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_s
        FROM e),
      sess AS (SELECT user_id, ts, value,
        CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
        FROM flags)
      SELECT user_id, session_idx,
        strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
        count(*) AS n_events,
        epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us,
        ${sqlDsum("value")} AS total_value
      FROM sess GROUP BY user_id, session_idx
      ORDER BY user_id, session_idx"""))

  /** G2: tumbling-window aggregation (1 h × event_type) — the batch
    * equivalent of the streaming windowed count in
    * [[graft.streaming.Streams.windowCounts]]; `window()` aligns to the
    * epoch hour exactly like date_trunc. */
  /** Public API: tumbling-window counts over any (ts, event_type, value)
    * frame. */
  def windowedCounts(events: DataFrame): DataFrame =
      events
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
        .select(
          date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("event_type"), col("n"), col("total"))
        .orderBy("window_start", "event_type")

  val qStreamWindow: Q = Q(
    "q_stream_window",
    (s, d) => windowedCounts(Tables.events(s, d)),
    Some(s"""SELECT strftime(date_trunc('hour', ts::TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS window_start,
      event_type, count(*) AS n, ${sqlDsum("value")} AS total
      FROM events GROUP BY 1, 2 ORDER BY window_start, event_type"""))

  /** G3 in batch form: first-seen dedup — keep each key's earliest row
    * under `order`. The same content-set semantics as the streaming
    * [[graft.streaming.Streams.dedup]] (there state-backed within the
    * watermark, here exact over the whole frame); the rank==1 filter
    * rewrites to the bounded-heap TopKPerKey operator, so the shuffle
    * carries at most one row per key per partition — never the full
    * duplicate fan-in.
    *
    * `order` must be a total order within each key (as with any
    * keep-first contract, ties make the survivor ill-defined). */
  def firstSeen(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    require(keys.nonEmpty && order.nonEmpty, "keys and order must be non-empty")
    // collision-guarded internal name: withColumn would silently
    // REPLACE (and drop() then remove) a caller column of the same name
    val rn = "__graft_first_seen_rn"
    require(!df.columns.contains(rn), s"input frame already has a $rn column")
    df.withColumn(rn, row_number().over(
        Window.partitionBy(keys.map(col): _*).orderBy(order: _*)))
      .filter(col(rn) === 1).drop(rn)
  }

  /** G3's batch twin as an oracle row. event_id is unique in the events
    * table, so the duplicates a stream would see are synthesized
    * deterministically: events with event_id % 10 < 3 get a "retry"
    * copy 1 s later with a shifted value — first-seen must keep every
    * ORIGINAL row (the +100 value would hash-mismatch if a retry ever
    * survived). Closes the G3 chain: stream == batch (StreamsSpec
    * differential) and batch == DuckDB (this hash oracle). */
  val qStreamDedupBatch: Q = Q(
    "q_stream_dedup_batch",
    (s, d) => {
      val ev = Tables.events(s, d)
      val retries = ev.filter(col("event_id") % 10 < 3)
        .withColumn("ts", col("ts") + expr("INTERVAL 1 SECOND"))
        .withColumn("value", col("value") + lit(100.0))
      firstSeen(ev.unionByName(retries), Seq("event_id"), Seq(col("ts")))
        .select(col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_s"),
          col("user_id"), col("event_type"), col("value"))
        .orderBy("event_id")
    },
    Some("""WITH base AS (
        SELECT event_id, ts::TIMESTAMP AS ts, user_id, event_type, value FROM events),
      input AS (
        SELECT * FROM base
        UNION ALL
        SELECT event_id, ts + INTERVAL 1 SECOND, user_id, event_type, value + 100.0
        FROM base WHERE event_id % 10 < 3),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY event_id ORDER BY ts) AS rn
        FROM input)
      SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_s,
        user_id, event_type, value
      FROM ranked WHERE rn = 1
      ORDER BY event_id"""))

  /** G4's batch twin: the final per-user counters
    * [[graft.streaming.Streams.runningUserStats]] converges to once a
    * user's events have all arrived — one groupBy aggregation. The
    * value total sums exact integer cents (`round(value*100)`, the same
    * rounding as the stream state's
    * [[graft.streaming.Streams.valueCents]]) and divides ONCE at
    * output, so the number is order-independent and hash-exact
    * cross-engine (the E5 fixed-point contract; a double `sum(value)`
    * would be partition-order-dependent and never bit-match DuckDB). */
  def userStats(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_purchases"),
        (sum(round(col("value") * 100).cast("long")) / 100.0).as("total_value"))
      .orderBy("user_id")

  /** The oracle row retiring G4's spec-only status: stream == batch
    * (StreamingSpec's runningUserStats differential) and batch == DuckDB
    * (this hash row) close the chain — the last G-family member without
    * a hash-green anchor. */
  val qUserStatsBatch: Q = Q(
    "q_user_stats_batch",
    (s, d) => userStats(Tables.events(s, d)),
    Some("""SELECT user_id, count(*) AS n_events,
      CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
      CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value
      FROM events GROUP BY user_id ORDER BY user_id"""))

  val all: Seq[Q] = Seq(qSessionize, qStreamWindow, qStreamDedupBatch,
    qUserStatsBatch)
}
