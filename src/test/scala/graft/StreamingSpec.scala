package graft

import java.sql.Timestamp

import graft.streaming.{EventRow, Streams}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** G2–G4: Structured Streaming operators driven from a MemoryStream and
  * observed through a memory sink — incremental results must match the
  * batch semantics on the same data. */
class StreamingSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  private val sample = Seq(
    EventRow(1L, ts(5), 1L, "click", 1.0),
    EventRow(2L, ts(10), 1L, "purchase", 10.0),
    EventRow(3L, ts(65), 2L, "click", 2.0),
    EventRow(4L, ts(70), 1L, "click", 3.0),
    EventRow(5L, ts(130), 2L, "purchase", 20.0))

  test("windowCounts (streaming) matches the batch aggregation") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[EventRow]
    val query = Streams.windowCounts(mem.toDF())
      .writeStream.format("memory").queryName("wc_stream")
      .outputMode(OutputMode.Update).start()
    try {
      mem.addData(sample: _*)
      query.processAllAvailable()
      val got = spark.table("wc_stream")
        .select("window_start", "event_type", "n", "total")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val want = Streams.windowCounts(sample.toDF())
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(got == want)
      assert(want.contains((ts(0), "click", 1L, 1.0)))
    } finally query.stop()
  }

  test("dedup drops re-delivered event ids within the watermark") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[EventRow]
    val query = Streams.dedup(mem.toDF())
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(sample: _*)
      query.processAllAvailable()
      mem.addData(sample.head, sample(1), EventRow(6L, ts(135), 3L, "view", 5.0))
      query.processAllAvailable()
      val ids = spark.table("dedup_stream").select("event_id")
        .collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L, 4L, 5L, 6L))
    } finally query.stop()
  }

  test("file-source stream: JSONL dir -> windowCounts -> memory sink") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("evstream").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "b1.json"),
      """{"event_id":1,"ts":"2024-01-01T00:05:00Z","user_id":1,"event_type":"click","value":1.0,"props":"{}"}
        |{"event_id":2,"ts":"2024-01-01T00:10:00Z","user_id":1,"event_type":"click","value":2.0,"props":"{}"}
        |""".stripMargin)
    val stream = graft.sources.Sources.jsonlEventStream(spark, dir)
    val query = Streams.windowCounts(stream)
      .writeStream.format("memory").queryName("file_stream")
      .outputMode(OutputMode.Update).start()
    try {
      query.processAllAvailable()
      val rows = spark.table("file_stream")
        .select("event_type", "n", "total").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      assert(rows.toSeq == Seq(("click", 2L, 3.0)))
    } finally query.stop()
  }

  test("runningUserStats accumulates state across micro-batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[EventRow]
    val query = Streams.runningUserStats(mem.toDS())
      .writeStream.format("memory").queryName("state_stream")
      .outputMode(OutputMode.Update).start()
    try {
      mem.addData(sample.take(3): _*)
      query.processAllAvailable()
      mem.addData(sample.drop(3): _*)
      query.processAllAvailable()
      // last update per user reflects ALL their events
      val last = spark.table("state_stream")
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
        .groupBy(_._1).map { case (u, rows) => u -> rows.last._2 }
      assert(last(1L) == ((3L, 1L, 14.0)))
      assert(last(2L) == ((2L, 1L, 22.0)))
    } finally query.stop()
  }
}
