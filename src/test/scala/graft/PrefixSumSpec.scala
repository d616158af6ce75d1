package graft

import graft.ops.ScaleOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class PrefixSumSpec extends SparkSpec {

  test("prefixSum equals the single-partition global window cumsum") {
    // adversarial layout: ids arrive hash-scattered across partitions;
    // values go negative (partition totals are not monotone)
    val df = spark.range(50000)
      .select((col("id") * 48271 % 50000).as("k"), (col("id") % 97 - 48).as("v"))
      .distinct() // unique order keys
      .repartition(13)
    val got = ScaleOps.prefixSum(df, "k", "v", "cum")
    val want = df.withColumn("cum",
      sum(col("v")).over(Window.orderBy(col("k"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }

  test("prefixSum plan shuffles the data once (range), never to a single partition") {
    val df = spark.range(1000).select(col("id").as("k"), lit(1L).as("v"))
    val plan = ScaleOps.prefixSum(df, "k", "v").queryExecution.executedPlan.toString
    // the data's one range exchange lives behind the checkpoint
    // boundary; in the visible plan the data side must carry NO window
    // (the only Window runs on the #partitions-row subtotal frame,
    // __psum) and the offsets must come back via broadcast, not a
    // data shuffle
    val dataWindows = plan.split("\n")
      .filter(l => l.contains("windowspecdefinition") && !l.contains("__psum"))
    assert(dataWindows.isEmpty, s"unexpected data-side window:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("prefixSum edge cases: empty frame, one row, output-name collision") {
    val empty = spark.range(0).select(col("id").as("k"), col("id").as("v"))
    assert(ScaleOps.prefixSum(empty, "k", "v").count() == 0)
    val one = spark.range(1).select(col("id").as("k"), lit(7L).as("v"))
    assert(ScaleOps.prefixSum(one, "k", "v").select("cum").head.getLong(0) == 7L)
    intercept[IllegalArgumentException] {
      ScaleOps.prefixSum(one.withColumn("cum", lit(1)), "k", "v")
    }
  }

  test("packShards: shards are contiguous, ~budget-sized, and start where the doc starts") {
    val out = Graft.packShards(Tables.documents(spark, sfDir), budget = 300).collect()
    var prevCum = 0L
    var prevShard = 0L
    out.foreach { r =>
      val (n, cum, shard) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(cum == prevCum + n) // the prefix sum is exact
      assert(shard == (cum - n) / 300) // doc starts in its shard's window
      assert(shard >= prevShard) // contiguous, monotone shard ids
      prevCum = cum; prevShard = shard
    }
  }

  test("packSequences: the token stream chops contiguously, spans are exact") {
    val L = 128L
    val out = graft.queries.Shards
      .packSequences(Tables.documents(spark, sfDir), contextLen = L).collect()
    var cum = 0L
    out.foreach { r =>
      val (n, seqFirst, off, nSeqs) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(seqFirst == cum / L) // doc starts exactly where the stream left off
      assert(off == cum % L)
      val wantSpans = if (n == 0) 0L else (cum + n - 1) / L - cum / L + 1
      assert(nSeqs == wantSpans)
      cum += n
    }
    // boundary-crossing docs exist in the corpus, so spans > 1 is exercised
    assert(out.exists(_.getLong(4) > 1))
  }

  test("packSequencesBpe: counts match the driver-run encoder; wordless docs keep a slot") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val out = graft.queries.Shards.packSequencesBpe(docs).collect()
    // reference: run the encoder automaton directly on every doc's words
    val ranks = graft.queries.Tokenizer.FixedMerges.map(_._1).zipWithIndex.toMap
    val ref = docs.select(col("doc_id"), col("text")).collect().map { r =>
      val ws = r.getString(1).toLowerCase.split("[^a-z]+").filter(_.nonEmpty)
      r.getLong(0) -> ws.map(w =>
        graft.queries.Tokenizer.encodeWord(w, ranks).length.toLong).sum
    }.toMap
    assert(out.length == ref.size)
    out.foreach(r => assert(r.getLong(1) == ref(r.getLong(0)),
      s"doc ${r.getLong(0)}: BPE count ${r.getLong(1)} != encoder's ${ref(r.getLong(0))}"))
    // the twin must actually re-weight: fertility > 1 somewhere, so the
    // BPE packing diverges from the whitespace packing
    val wsCounts = graft.queries.Shards.packSequences(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.exists(r => r.getLong(1) != wsCounts(r.getLong(0))),
      "BPE token counts identical to whitespace counts everywhere — no-op twin")
    // a wordless doc still occupies a zero-width slot in the stream
    val tiny = Seq((1L, "alpha beta"), (2L, "123 456"), (3L, "gamma"))
      .toDF("doc_id", "text")
    val t = graft.queries.Shards.packSequencesBpe(tiny).collect()
    assert(t.length == 3 && t.find(_.getLong(0) == 2L).get.getLong(1) == 0L)
  }

  test("weightedSampleBpe: drawn weights are the learned-tokenizer counts") {
    val docs = Tables.documents(spark, sfDir)
    val got = graft.queries.Shards.weightedSampleBpe(docs, k = 10, seed = 3L).collect()
    val ranks = graft.queries.Tokenizer.FixedMerges.map(_._1).zipWithIndex.toMap
    val ref = docs.select(col("doc_id"), col("text")).collect().map { r =>
      val ws = r.getString(1).toLowerCase.split("[^a-z]+").filter(_.nonEmpty)
      r.getLong(0) -> ws.map(w =>
        graft.queries.Tokenizer.encodeWord(w, ranks).length.toLong).sum
    }.toMap
    assert(got.length == 10)
    got.foreach(r => assert(r.getLong(1) == ref(r.getLong(0)),
      s"doc ${r.getLong(0)}: drawn weight ${r.getLong(1)} != BPE count ${ref(r.getLong(0))}"))
    // re-weighting is live: same seed, the BPE draw keys differ from the
    // whitespace draw's wherever fertility > 1
    val ws = graft.queries.Shards.weightedSample(docs, k = 10, seed = 3L).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.exists(r => !ws.get(r.getLong(0)).contains(r.getDouble(2))),
      "BPE draw keys identical to whitespace draw keys — re-weighting is a no-op")
  }

  test("stratifiedSample: n per stratum, deterministic across runs") {
    val docs = Tables.documents(spark, sfDir)
    val a = Graft.stratifiedSample(docs, n = 7).collect().map(_.toSeq).toSeq
    val b = Graft.stratifiedSample(docs, n = 7).collect().map(_.toSeq).toSeq
    assert(a == b)
    val perStratum = Graft.stratifiedSample(docs, n = 7)
      .groupBy("source").count().collect().map(_.getLong(1))
    assert(perStratum.forall(_ == 7L))
  }

  test("stratifiedSample survives 100TB-scale doc ids (no ANSI multiply overflow)") {
    import spark.implicits._
    val big = Seq(
      (5000000000L, "a"), (5000000001L, "a"), (7L, "a"), (9999999999L, "b"))
      .toDF("doc_id", "source")
    val got = Graft.stratifiedSample(big, n = 2)
    assert(got.count() == 3) // 2 from stratum a, 1 from b — and no overflow error
  }
}
