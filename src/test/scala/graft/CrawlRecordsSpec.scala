package graft

import graft.media.CrawlCodec
import graft.queries.CrawlRecords
import org.apache.spark.sql.functions._

/** C29 [[CrawlCodec]]/[[CrawlRecords]]: length-prefixed parse inverts
  * the writer on adversarial bodies, damage ends one file's parse
  * without touching earlier records or other files, and the parsed
  * rows feed the C26 → C25 ingest chain. */
class CrawlRecordsSpec extends SparkSpec {
  import spark.implicits._

  private def payload(recs: (String, String)*): Array[Byte] =
    recs.flatMap { case (u, b) =>
      CrawlCodec.frame(u, b.getBytes("UTF-8"))
    }.toArray

  test("parse inverts frame on bodies containing every delimiter") {
    val recs = Seq(
      "https://a.example/1" -> "plain body",
      // the blank-line trailer INSIDE a body — a delimiter scan would
      // split here; the length prefix must walk past it
      "https://a.example/2" -> "para one\r\n\r\npara two\r\n\r\n",
      // the record magic inside a body
      "https://a.example/3" -> "quoting WARC/1.0\r\nWARC-Target-URI: x\r\n here",
      // non-ASCII bytes: Content-Length counts BYTES, not chars
      "https://a.example/4" -> "café 日本語 😀",
      "https://a.example/5" -> "")
    val got = CrawlCodec.parse(9L, payload(recs: _*))
    assert(got.size == recs.size, s"expected ${recs.size} records: $got")
    got.zip(recs).zipWithIndex.foreach { case ((r, (u, b)), i) =>
      assert(r.file_id == 9L && r.rec_idx == i.toLong &&
        r.url == u && r.html == b &&
        r.n_bytes == b.getBytes("UTF-8").length.toLong,
        s"record $i mismatched: $r")
    }
  }

  test("damage contract: truncation, length lies, and corrupt magic end the parse cleanly") {
    val good = payload(
      "https://x/1" -> "first body",
      "https://x/2" -> "second body")
    // truncated mid-body: record 1 survives, record 2 drops
    val truncated = good.dropRight(8)
    val t = CrawlCodec.parse(1L, truncated)
    assert(t.map(_.url) == Seq("https://x/1"), t)
    // a length LIE pointing past the payload: nothing after the lie
    val lie = CrawlCodec.frame("https://x/1", "ok".getBytes("UTF-8")) ++
      ("WARC/1.0\r\nWARC-Target-URI: https://x/2\r\n" +
        "Content-Length: 99999\r\n\r\nshort\r\n\r\n").getBytes("UTF-8")
    val l = CrawlCodec.parse(2L, lie)
    assert(l.map(_.url) == Seq("https://x/1"), l)
    // corrupt magic mid-file
    val corrupt = CrawlCodec.frame("https://x/1", "ok".getBytes("UTF-8")) ++
      "GARBAGE".getBytes("UTF-8")
    assert(CrawlCodec.parse(3L, corrupt).map(_.url) == Seq("https://x/1"))
    // empty payload parses to nothing, no crash
    assert(CrawlCodec.parse(4L, Array.emptyByteArray).isEmpty)
  }

  test("a damaged file leaves other files untouched (per-file independence)") {
    val files = Seq(
      (1L, payload("https://x/1" -> "body one")),
      (2L, payload("https://x/2" -> "body two").dropRight(4)), // damaged
      (3L, payload("https://x/3" -> "body three")))
      .toDF("file_id", "payload")
    val got = CrawlRecords.crawlRecords(files)
      .select("file_id", "url").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSet
    assert(got == Set(1L -> "https://x/1", 3L -> "https://x/3"), got)
  }

  test("parsed records feed the C26 url gate and C25 extraction — ingest from bytes") {
    val docs = Tables.documents(spark, sfDir)
    val recs = CrawlRecords.crawlRecords(
        CrawlRecords.crawlFilesFrom(docs))
      .withColumn("doc_id",
        regexp_extract(col("url"), "/([0-9]+)$", 1).cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    assert(recs.count() == docs.count(), "every doc must re-emerge as a record")
    // C26: the url gate runs on the parsed urls
    val gated = Graft.urlFilter(recs.select(col("doc_id"), col("url")),
      blockedDomains = Nil)
    assert(gated.count() == docs.count())
    // C25: extraction over the parsed html recovers each doc's words
    val ext = Graft.extractText(
      recs.select(col("doc_id"), col("html").as("text")))
    def collapsed(c: org.apache.spark.sql.Column) =
      regexp_replace(trim(coalesce(c, lit(""))), "\\s+", " ")
    val diff = ext.select(col("doc_id"), col("text_clean"))
      .join(docs.select(col("doc_id"), col("text")), "doc_id")
      .filter(not(collapsed(col("text_clean")) === collapsed(col("text"))))
      .count()
    assert(diff == 0L,
      "extraction over parsed records must recover each doc's own text")
    recs.unpersist(blocking = false)
  }

  private def gzPayload(recs: (String, String)*): Array[Byte] =
    recs.flatMap { case (u, b) =>
      CrawlCodec.frameGzip(u, b.getBytes("UTF-8"))
    }.toArray

  test("gzip members: parseGzip inverts per-record frameGzip, adversarial bodies included") {
    val recs = Seq(
      "https://g.example/1" -> "plain body",
      "https://g.example/2" -> "para one\r\n\r\npara two\r\n\r\n",
      "https://g.example/3" -> "quoting WARC/1.0\r\nWARC-Target-URI: x\r\n here",
      "https://g.example/4" -> "café 日本語 😀",
      "https://g.example/5" -> "")
    val got = CrawlCodec.parseGzip(9L, gzPayload(recs: _*))
    assert(got.size == recs.size, s"expected ${recs.size} records: $got")
    got.zip(recs).zipWithIndex.foreach { case ((r, (u, b)), i) =>
      assert(r.file_id == 9L && r.rec_idx == i.toLong &&
        r.url == u && r.html == b &&
        r.n_bytes == b.getBytes("UTF-8").length.toLong,
        s"gz record $i mismatched: $r")
    }
    // and the compressed path agrees with the plain path record for record
    assert(got == CrawlCodec.parse(9L, payload(recs: _*)))
  }

  test("gzip damage contract: truncated/corrupt members keep the inflated prefix only") {
    val good = gzPayload(
      "https://gz/1" -> "first body",
      "https://gz/2" -> "second body")
    // truncated inside the SECOND member: member 1 inflates whole,
    // record 1 survives, record 2 drops
    val firstLen = CrawlCodec.frameGzip("https://gz/1",
      "first body".getBytes("UTF-8")).length
    val truncated = good.take(firstLen + 6) // second member's header only
    assert(CrawlCodec.parseGzip(1L, truncated).map(_.url) == Seq("https://gz/1"))
    // corrupt bytes where the next member header should be
    val corrupt = good.take(firstLen) ++ "GARBAGE".getBytes("UTF-8")
    assert(CrawlCodec.parseGzip(2L, corrupt).map(_.url) == Seq("https://gz/1"))
    // flipped byte INSIDE the first member's deflate stream: nothing
    // inflates cleanly past the header — no records, no crash
    val flipped = good.clone()
    flipped(firstLen / 2) = (flipped(firstLen / 2) ^ 0x5a).toByte
    assert(CrawlCodec.parseGzip(3L, flipped).count(_.url == "https://gz/2") == 0)
    // empty payload parses to nothing, no crash
    assert(CrawlCodec.parseGzip(4L, Array.emptyByteArray).isEmpty)
  }

  test("gzip files table: the full corpus through the compressed framing equals the plain framing") {
    val docs = Tables.documents(spark, sfDir).limit(64)
    val plain = CrawlRecords.crawlRecords(
        graft.queries.CrawlRecords.crawlFilesFrom(docs))
      .orderBy("file_id", "rec_idx").collect().map(_.toSeq)
    val gz = CrawlRecords.crawlRecords(
        graft.queries.CrawlRecords.crawlFilesGzFrom(docs), gzip = true)
      .orderBy("file_id", "rec_idx").collect().map(_.toSeq)
    assert(plain.toSeq == gz.toSeq,
      "the .warc.gz path must emit exactly the plain framing's records")
  }
}
