package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed loaders for the driver-generated star schema (see TESTDATA.md).
  *
  * Scale note: these are plain parquet scans — Catalyst pushes filters and
  * prunes columns into the scan, so every query should select/filter on the
  * loaded frame directly rather than caching wide tables.
  */
object Tables {
  def tbl(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = tbl(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = tbl(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = tbl(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = tbl(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = tbl(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = tbl(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = tbl(s, d, "lineitem")
  /** events.parquet's ts encoding has varied across driver-generated
    * datasets: TIMESTAMP(NANOS) (read as a LONG under
    * `spark.sql.legacy.parquet.nanosAsLong=true` — sessions must still
    * set it so a nanos file doesn't fail the scan outright) or plain
    * TIMESTAMP(MICROS) (read natively as a timestamp). Normalize both
    * to a microsecond timestamp: long nanos truncate with integer
    * `div` (the values exceed 2^53, so a double division would corrupt
    * them) — DuckDB's `ts::TIMESTAMP` truncates ns→µs identically —
    * and native timestamps (NTZ or LTZ; the session is pinned UTC so
    * the two agree) pass through unchanged. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    val raw = tbl(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampType => raw
      case org.apache.spark.sql.types.TimestampNTZType =>
        // session tz is pinned UTC, so NTZ -> LTZ is a pure relabel
        raw.withColumn("ts", expr("cast(ts as timestamp)"))
      case other =>
        // fail LOUDLY on a new driver encoding: a permissive cast would
        // coerce e.g. a string or int32 ts (possibly to nulls) and
        // silently drift every downstream events query
        throw new IllegalArgumentException(
          s"events.ts: unsupported parquet encoding $other — expected " +
            "INT64 nanos (legacy.parquet.nanosAsLong), TIMESTAMP, or " +
            "TIMESTAMP_NTZ; teach Tables.events this encoding explicitly")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = tbl(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = tbl(s, d, "embeddings")
}
