package graft

import graft.queries.{Dedup, SpanIncremental}
import org.apache.spark.sql.functions._

/** D27 [[SpanIncremental]]: the incremental audit/rewrite equal the
  * full-corpus D14/D16 restricted to batch docs (the losslessness
  * contract the oracle also proves), the stored key frame is
  * interchangeable with lake text, keeper arithmetic survives id
  * interleaving, the clash guard fires, and a multi-batch chain
  * through the parquet gram-key store replays the full operators
  * batch by batch. */
class SpanIncrementalSpec extends SparkSpec {
  import spark.implicits._

  // 5-gram phrases (DupSpanN = 5): X shared lake<->batch, Y repeated
  // within the batch, Z unique corpus-wide
  private val X = "alpha beta gamma delta epsilon"
  private val Y = "one two three four five"
  private def docsDf(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")

  test("audit: lake-known and in-batch-repeated grams flagged, unique text not") {
    val lake = docsDf(Seq(10L -> s"filler00 $X filler01"))
    val batch = docsDf(Seq(
      1L -> s"start pad $X tail words here",   // X known from the lake
      2L -> s"lead in $Y mid section $Y done", // Y repeats in-batch
      3L -> "totally unique sentence nothing shared anywhere at all"))
    val spans = SpanIncremental.dupSpansIncremental(batch, lake)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(spans.map(_._1).toSet == Set(1L, 2L), s"flagged docs: $spans")
    // doc 1: X occupies tokens 3..7 -> the 5-gram at p=3 covers [3, 7]
    assert(spans.contains((1L, 3L, 7L)), spans)
    assert(!spans.exists(_._1 == 3L), "unique doc must not be flagged")
  }

  test("audit and rewrite equal full D14/D16 over the union restricted to batch docs") {
    val docs = Tables.documents(spark, sfDir)
    val lake = docs.filter(col("doc_id") % 3 === 0)
    val batch = docs.filter(col("doc_id") % 3 =!= 0)
    val incA = SpanIncremental.dupSpansIncremental(batch, lake)
      .collect().map(_.toSeq).toSeq
    val fullA = Dedup.dupSpans(docs).filter(col("doc_id") % 3 =!= 0)
      .collect().map(_.toSeq).toSeq
    assert(incA == fullA, "incremental audit diverged from full D14")
    val incX = SpanIncremental.exciseSpansIncremental(batch, lake)
      .collect().map(_.toSeq).toSeq
    val fullX = Dedup.exciseSpans(docs).filter(col("doc_id") % 3 =!= 0)
      .collect().map(_.toSeq).toSeq
    assert(incX == fullX, "incremental rewrite diverged from full D16")
  }

  test("the stored (h, keeper) frame is interchangeable with lake text") {
    val docs = Tables.documents(spark, sfDir)
    val lake = docs.filter(col("doc_id") % 3 === 0)
    val batch = docs.filter(col("doc_id") % 3 =!= 0)
    val keyFrame = SpanIncremental.gramKeyFrame(lake)
    val a = SpanIncremental.dupSpansIncremental(batch, keyFrame)
      .collect().map(_.toSeq).toSeq
    val b = SpanIncremental.dupSpansIncremental(batch, lake)
      .collect().map(_.toSeq).toSeq
    assert(a == b, "audit: key-frame lake diverged from text lake")
    val c = SpanIncremental.exciseSpansIncremental(batch, keyFrame)
      .collect().map(_.toSeq).toSeq
    val d = SpanIncremental.exciseSpansIncremental(batch, lake)
      .collect().map(_.toSeq).toSeq
    assert(c == d, "rewrite: key-frame lake diverged from text lake")
  }

  test("keeper arithmetic under interleaved ids: the union-global first occurrence wins") {
    // X in batch doc 1 (p=1) and lake doc 10: batch occ 1*2^31+1 <
    // lake keeper 10*2^31+1, so the BATCH occurrence is the global
    // keeper and survives the rewrite; X in lake doc 2 vs batch doc 5:
    // lake wins, batch occurrence excised
    val lakeA = docsDf(Seq(10L -> X))
    val batchA = docsDf(Seq(1L -> X))
    val outA = SpanIncremental.exciseSpansIncremental(batchA, lakeA)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(outA(1L) == 0L,
      s"batch-first occurrence must be the keeper (kept), got excised=${outA(1L)}")
    val lakeB = docsDf(Seq(2L -> X))
    val batchB = docsDf(Seq(5L -> X))
    val outB = SpanIncremental.exciseSpansIncremental(batchB, lakeB)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(outB(5L) == 5L,
      s"lake-first occurrence must win (batch excised), got excised=${outB(5L)}")
  }

  test("overlapping doc_ids between batch and a text lake fail loudly") {
    val lake = docsDf(Seq(7L -> X))
    val batch = docsDf(Seq(7L -> Y))
    val ex = intercept[Exception] {
      SpanIncremental.exciseSpansIncremental(batch, lake).collect()
    }
    assert(ex.getMessage != null &&
      ex.getMessage.contains("must be disjoint"), ex.getMessage)
  }

  test("multi-batch chain through the parquet gram-key store replays the full operators") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dir = java.nio.file.Files.createTempDirectory("graft-gramkeys")
      .resolve("store").toString
    // three "nightly" batches by id band; each audits+rewrites against
    // the accumulated store, then appends its OWN raw gram keys
    val bands = Seq(
      col("doc_id") % 3 === 0,
      col("doc_id") % 3 === 1,
      col("doc_id") % 3 === 2)
    val got = bands.map { b =>
      val batch = docs.filter(b)
      val store = graft.sources.Sinks.readGramKeys(spark, dir)
      val audit = SpanIncremental.dupSpansIncremental(batch, store)
        .collect().map(_.toSeq).toSeq
      val rewrite = SpanIncremental.exciseSpansIncremental(batch, store)
        .collect().map(_.toSeq).toSeq
      graft.sources.Sinks.appendGramKeys(batch, dir)
      (audit, rewrite)
    }
    // reference: full D14/D16 over everything ingested SO FAR,
    // restricted to the batch — the same incremental contract
    val expect = bands.zipWithIndex.map { case (b, i) =>
      val soFar = docs.filter(bands.take(i + 1).reduce(_ || _))
      (Dedup.dupSpans(soFar).filter(b).collect().map(_.toSeq).toSeq,
        Dedup.exciseSpans(soFar).filter(b).collect().map(_.toSeq).toSeq)
    }
    got.zip(expect).zipWithIndex.foreach { case (((ga, gr), (ea, er)), i) =>
      assert(ga == ea, s"batch $i audit diverged from full D14 over the lake so far")
      assert(gr == er, s"batch $i rewrite diverged from full D16 over the lake so far")
    }
    docs.unpersist(blocking = false)
  }
}
