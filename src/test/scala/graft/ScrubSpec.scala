package graft

import graft.queries.Scrub
import org.apache.spark.sql.functions._

class ScrubSpec extends SparkSpec {

  test("scrubPii finds and redacts mixed real-world-shaped PII") {
    import spark.implicits._
    val docs = Seq(
      (1L, "contact a.smith+spam@mail.example.org or b@x.co today"),
      (2L, "server at 192.168.0.1, fallback 10.0.0.254. done"),
      (3L, "call +44-207-9460000 now"),
      (4L, "mixed bob@corp.io from 127.0.0.1 dials +1-555-0100"),
      (5L, "nothing sensitive here 1.2.3 not.an.ip 999 @nohost")
    ).toDF("doc_id", "text")
    val byId = Scrub.scrubPii(docs)
      .select("doc_id", "text", "n_emails", "n_ipv4", "n_phones")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(byId(1L) == ("contact <EMAIL> or <EMAIL> today", 2L, 0L, 0L))
    assert(byId(2L) == ("server at <IP>, fallback <IP>. done", 0L, 2L, 0L))
    assert(byId(3L) == ("call <PHONE> now", 0L, 0L, 1L))
    assert(byId(4L) == ("mixed <EMAIL> from <IP> dials <PHONE>", 1L, 1L, 1L))
    assert(byId(5L) == ("nothing sensitive here 1.2.3 not.an.ip 999 @nohost", 0L, 0L, 0L))
  }

  test("q_pii_scrub recovers exactly the planted canary set") {
    val out = SparkEntry.queries("q_pii_scrub")(spark, sfDir)
    val bad = out.filter(
      col("n_emails") =!= when(col("doc_id") % 3 === 0, 1L).otherwise(0L) ||
      col("n_ipv4") =!= when(col("doc_id") % 5 === 0, 1L).otherwise(0L) ||
      col("n_phones") =!= when(col("doc_id") % 7 === 0, 1L).otherwise(0L))
    assert(bad.count() == 0)
    assert(out.count() == Tables.documents(spark, sfDir).count())
  }
}
