package graft

import org.apache.spark.sql.functions._

/** [[Tables.events]] must normalize BOTH historical ts encodings of
  * the driver-generated events table — TIMESTAMP(NANOS) (reads as a
  * LONG under `spark.sql.legacy.parquet.nanosAsLong=true`) and plain
  * timestamp[us] — to the same microsecond timestamps. The micros
  * switch in round-7 testdata broke every events query at analysis
  * time until the loader sniffed the read schema; the committed
  * fixtures pin both paths forever. */
class EventsEncodingSpec extends SparkSpec {

  private def dir(enc: String): String = {
    val url = getClass.getResource(s"/events_enc/$enc")
    assert(url != null, s"missing fixture events_enc/$enc")
    url.getPath
  }

  test("nanos and micros events fixtures normalize to identical timestamps") {
    val nanos = Tables.events(spark, dir("nanos"))
      .select(col("event_id"), date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("t"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val micros = Tables.events(spark, dir("micros"))
      .select(col("event_id"), date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("t"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(nanos == micros && nanos.size == 5, s"nanos=$nanos micros=$micros")
    assert(nanos(3L) == "2026-01-01 00:00:03.000000")
  }

  test("both encodings expose a timestamp-typed ts column") {
    for (enc <- Seq("nanos", "micros"))
      assert(Tables.events(spark, dir(enc)).schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampType, enc)
  }
}
