package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event of the stream — mirrors the events table schema (ts already
  * converted to a microsecond timestamp, see [[graft.Tables.events]]). */
final case class EventRow(
    event_id: Long,
    ts: java.sql.Timestamp,
    user_id: Long,
    event_type: String,
    value: Double)

/** Running per-user state for [[Streams.runningUserStats]]. */
final case class UserCounters(n_events: Long, n_purchases: Long, total_value: Double)

/** Emitted update: the user's counters after a batch of their events. */
final case class UserUpdate(
    user_id: Long, n_events: Long, n_purchases: Long, total_value: Double)

/** Structured Streaming operators (SURVEY.md §2 G2–G4). Each takes the
  * event stream as a DataFrame/Dataset so tests can drive it from a
  * MemoryStream and production from `readStream` — the transform IS the
  * operator; source/sink wiring stays at the edge.
  *
  * Scale notes: every operator keys its state by a high-cardinality
  * column (user_id / event_id / window×type), so state shards across
  * executors; watermarks bound state size — without them a 100 TB/day
  * stream would grow state forever.
  */
object Streams {

  /** G2 (streaming form): tumbling 1 h × event_type counts. The 2 h
    * watermark lets late events up to 2 h old revise their window before
    * the window's state is finalized and dropped. */
  def windowCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(38,10)")).as("total_dec"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), round(col("total_dec"), 2).cast("double").as("total"))

  /** G3: streaming exact dedup on event_id — watermarked state, so an id
    * is remembered only while a duplicate could still legally arrive. */
  def dedup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** G4: custom state machine via flatMapGroupsWithState — running
    * per-user counters, emitting the updated state once per user per
    * micro-batch (Update mode). */
  def runningUserStats(events: Dataset[EventRow]): Dataset[UserUpdate] = {
    import events.sparkSession.implicits._
    def update(
        userId: Long,
        rows: Iterator[EventRow],
        state: GroupState[UserCounters]): Iterator[UserUpdate] = {
      var st = state.getOption.getOrElse(UserCounters(0L, 0L, 0.0))
      rows.foreach { e =>
        st = UserCounters(
          st.n_events + 1,
          st.n_purchases + (if (e.event_type == "purchase") 1 else 0),
          st.total_value + e.value)
      }
      state.update(st)
      Iterator.single(UserUpdate(userId, st.n_events, st.n_purchases, st.total_value))
    }
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(update)
  }
}
