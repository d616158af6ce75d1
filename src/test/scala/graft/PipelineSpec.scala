package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** End-to-end composition: the "switch from the reference" pipeline —
  * ingest a text corpus, score quality, drop exact dups, write
  * partitioned parquet, read it back pruned. Each stage is covered
  * individually elsewhere; this pins that they COMPOSE. */
class PipelineSpec extends SparkSpec {

  test("corpus -> quality -> dedup -> partitioned parquet round trip") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .unionByName( // plant one exact dup of doc 0
        Tables.documents(spark, sfDir).filter($"doc_id" === 0)
          .withColumn("doc_id", lit(999999L)))

    val quality = Graft.qualityScores(docs)
      .select($"doc_id", $"quality_score")
    val keep = Graft.exactDuplicates(docs).filter(!$"is_dup")
      .join(quality, "doc_id")
      .join(docs.select($"doc_id", $"text", $"source"), "doc_id")

    val out = Files.createTempDirectory("pipe").toString
    Graft.sinks.parquet(keep, s"$out/clean", partitionBy = Seq("source"))

    val back = spark.read.parquet(s"$out/clean")
    assert(back.count() == docs.count() - 1) // exactly the dup dropped
    assert(back.filter($"doc_id" === 999999L).count() == 0)
    // partition pruning works on the sink layout
    val pruned = back.filter($"source" === "src1")
    assert(pruned.queryExecution.executedPlan.toString
      .contains("PartitionFilters: [isnotnull(source"))
    assert(pruned.count() == docs.filter($"source" === "src1" && $"doc_id" =!= 999999L).count())
  }

  test("curateClusters keeps one survivor per near-dup cluster, never more than curate") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val greedy = Graft.curate(docs).select("doc_id")
    val cluster = Graft.curateClusters(docs).select("doc_id")
    // greedy drops any pair's larger id; the cluster form drops every
    // non-min member — a strict superset of the greedy drops
    assert(cluster.exceptAll(greedy).count() == 0)
    // survivors == distinct components over the exact-dedup survivors
    val afterExact = Graft.curate(docs, dropNearDups = false)
    val pairs = Graft.minhashPairs(afterExact).select($"id_a", $"id_b")
    val labels = Graft.connectedComponents(pairs, "id_a", "id_b")
    val multi = labels.select($"component").distinct().count()
    val paired = labels.count()
    assert(cluster.count() == afterExact.count() - (paired - multi))
  }

  test("pipelineAudit stages flags as the paper orders them") {
    import spark.implicits._
    // passes both gates: 35 words (>= 10), 7 corpus stopwords, every
    // token distinct (no dominant gram — a SHORT doc fails r5_top4
    // purely because one 4-gram is >16% of its chars), and a tag token
    // every 5 positions so docs with different tags share no 8-gram
    // (keeps the contamination stage planted, not accidental)
    def good(t: String) = Seq(
      s"the cat ${t}aa big house", s"and dog ${t}bb warm garden",
      s"of bird ${t}cc tall market", s"to fish ${t}dd wide basket",
      s"a goat ${t}ee ripe apple", s"in lamb ${t}ff sweet pear",
      s"is wolf ${t}gg fresh plum").mkString(" ")
    val eval = Seq((0L, good("evl"))).toDF("doc_id", "text")
    val train = Seq(
      (1L, good("one")),               // clean: kept
      (2L, good("two")),               // content-dup of 5 (gated pair)
      (3L, "tiny doc"),                // fails rule gate (word count)
      (4L, Seq.fill(9)("same line of the text here and there again").mkString("\n")), // fails rep gate
      (5L, good("two")),               // dup of 2 -> larger id excised
      (6L, "tiny doc"),                // content-dup of 3 but BOTH gated out -> is_dup 0
      (7L, good("evl")))               // contaminated (quotes the eval doc)
      .toDF("doc_id", "text")
    val stops = Seq("the", "a", "of", "and", "to", "in", "is")
    val out = Graft.pipelineAudit(train, eval, minWords = 10L, stops = stops)
      .collect().toSeq.map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))
    // "tiny doc" also fails the rep gate: its ONE 2-gram covers 100%
    // of its chars — the short-doc r3 regime, stage-faithful here
    assert(out == Seq(
      (1L, 1L, 1L, 0L, 0L, 1L),
      (2L, 1L, 1L, 0L, 0L, 1L),
      (3L, 0L, 0L, 0L, 0L, 0L),
      (4L, 1L, 0L, 0L, 0L, 0L),
      (5L, 1L, 1L, 1L, 0L, 0L),
      (6L, 0L, 0L, 0L, 0L, 0L),
      (7L, 1L, 1L, 0L, 1L, 0L)), out)
    // differential vs EVERY standalone stage on the same frames
    val rules = graft.queries.TextAnalysis
      .gopherRules(train, minWords = 10L, stops = stops)
      .select($"doc_id", $"kept").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { case (id, pr, _, _, _, _) => assert(rules(id) == pr, id) }
    val rep = Graft.gopherRepetition(train)
      .select($"doc_id", $"kept").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { case (id, _, pp, _, _, _) => assert(rep(id) == pp, id) }
    val gatedIds = out.filter(o => o._2 == 1L && o._3 == 1L).map(_._1).toSet
    val dup = Graft.exactDuplicates(train.filter($"doc_id".isin(gatedIds.toSeq: _*)))
      .select($"doc_id", $"is_dup").collect()
      .map(r => r.getLong(0) -> (if (r.getBoolean(1)) 1L else 0L)).toMap
    out.foreach { case (id, _, _, d, _, _) =>
      assert(dup.getOrElse(id, 0L) == d, id)
    }
    val contam = Graft.decontaminate(train, eval)
      .select($"doc_id", $"contaminated").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { case (id, _, _, _, c, _) => assert(contam(id) == c, id) }
    graft.ops.Release.sweep(spark)
  }

  test("pipelineProduce: audit-kept doc set, excised tokens, epoch-order packing") {
    import spark.implicits._
    def good(t: String) = Seq(
      s"the cat ${t}aa big house", s"and dog ${t}bb warm garden",
      s"of bird ${t}cc tall market", s"to fish ${t}dd wide basket",
      s"a goat ${t}ee ripe apple", s"in lamb ${t}ff sweet pear",
      s"is wolf ${t}gg fresh plum").mkString(" ")
    // a 10-token run shared by docs 8 and 9: the later (doc_id, pos)
    // occurrence — doc 9's copy — is the one D16 excises
    val tail = "amber boulder cinder dapple ember fennel garnet hollow indigo juniper"
    val eval = Seq((0L, good("evl"))).toDF("doc_id", "text")
    val train = Seq(
      (1L, good("one")),             // kept
      (2L, good("two")),             // kept; dup partner of 5
      (3L, "tiny doc"),              // gated out
      (5L, good("two")),             // dup of 2 -> dropped
      (7L, good("evl")),             // contaminated -> dropped
      (8L, good("exa") + " " + tail), // kept; keeper of the tail grams
      (9L, good("exb") + " " + tail)) // kept; tail excised
      .toDF("doc_id", "text")
    val stops = Seq("the", "a", "of", "and", "to", "in", "is")
    val out = Graft.pipelineProduce(train, eval, minWords = 10L,
        stops = stops, seed = 3L)
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // produced ids == pipelineAudit's kept set under the same params
    val keptIds = Graft.pipelineAudit(train, eval, minWords = 10L, stops = stops)
      .filter($"kept" === 1L).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(out.map(_._1).toSet == keptIds && keptIds == Set(1L, 2L, 8L, 9L), out)
    // epoch positions are a permutation of 1..n
    assert(out.map(_._2).sorted == (1L to out.size).toSeq, out)
    // excision flows into the token weights: doc 9 loses the tail AND
    // the shared boundary run ("fresh plum" precedes the tail in both
    // docs, so grams spanning the seam duplicate too — covered-token
    // union semantics), while keeper doc 8 keeps everything
    val tok = out.map(o => o._1 -> o._3).toMap
    assert(tok(9L) < tok(1L) && tok(1L) < tok(8L), tok)
    // differential vs the standalone operators: n_tokens must equal
    // D16's text_clean run through the C13 fertility counter
    val cleanSub = train.filter($"doc_id".isin(1L, 2L, 8L, 9L))
    val expectTok = graft.queries.Tokenizer.bpeStats(
        Graft.exciseSpans(cleanSub)
          .select($"doc_id", $"text_clean".as("text")),
        graft.queries.Tokenizer.FixedMerges)
      .select($"doc_id", $"n_bpe_tokens").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.forall(o => expectTok(o._1) == o._3), s"$out vs $expectTok")
    // packing geometry reconstructs from (pos, n_tokens) by prefix sum
    val ctx = graft.queries.Shards.DefaultContextLen
    var cum = 0L
    out.sortBy(_._2).foreach { case (id, _, n, first, off, nseq) =>
      assert(first == cum / ctx && off == cum % ctx, id)
      assert(nseq == (if (n > 0) (cum + n - 1) / ctx - cum / ctx + 1 else 0L), id)
      cum += n
    }
    // seed sensitivity: a different epoch yields a different order
    val pos7 = Graft.pipelineProduce(train, eval, minWords = 10L,
        stops = stops, seed = 7L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.map(o => o._1 -> o._2).toMap != pos7)
    graft.ops.Release.sweep(spark)
  }
}
