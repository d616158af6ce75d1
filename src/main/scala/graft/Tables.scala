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
  /** events.parquet stores ts as TIMESTAMP(NANOS), which Spark's parquet
    * reader rejects outright. Sessions must set
    * `spark.sql.legacy.parquet.nanosAsLong=true`; here we truncate the
    * long nanos to a microsecond timestamp (integer `div` — the values
    * exceed 2^53, so a double division would corrupt them). DuckDB's
    * `ts::TIMESTAMP` truncates ns→µs identically. */
  def events(s: SparkSession, d: String): DataFrame =
    tbl(s, d, "events").withColumn(
      "ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  def documents(s: SparkSession, d: String): DataFrame = tbl(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = tbl(s, d, "embeddings")
}
