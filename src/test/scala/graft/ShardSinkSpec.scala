package graft

import java.nio.file.Files

import graft.sources.Sinks
import org.apache.spark.sql.functions._

/** [[graft.sources.Sinks.writeShards]] / `readShards` /
  * `verifyShards`: the training-shard artifact round trip — layout
  * (one file per shard directory), content equality, budget geometry,
  * manifest integrity, determinism, and the tamper detector. */
class ShardSinkSpec extends SparkSpec {

  private def tmpDir(name: String): String = {
    val d = Files.createTempDirectory(name)
    d.toFile.deleteOnExit()
    d.toString
  }

  private lazy val docs = Tables.documents(spark, sfDir)

  test("round trip: every doc comes back, in its assigned shard, one file per shard") {
    val dir = tmpDir("shards")
    val manifest = Sinks.writeShards(docs, dir, budget = 512)
    val back = Sinks.readShards(spark, dir)
    assert(back.count() == docs.count())
    // content equality (doc_id, text)
    assert(back.select("doc_id", "text").exceptAll(
      docs.select("doc_id", "text")).isEmpty)
    // assignment equality vs the H4 operator
    val want = graft.queries.Shards.packShards(docs, 512)
      .select("doc_id", "shard_id")
    assert(back.select("doc_id", "shard_id").exceptAll(want).isEmpty)
    // one coherent file per shard directory (materialize the file name
    // first: input_file_name is nondeterministic, so it cannot sit
    // inside an aggregate argument)
    val filesPerShard = back
      .select(col("shard_id"), input_file_name().as("f"))
      .distinct()
      .groupBy("shard_id").agg(count(lit(1)).as("nf"))
      .agg(max(col("nf"))).head().getLong(0)
    assert(filesPerShard == 1L, s"max files per shard dir: $filesPerShard")
    // manifest totals equal corpus totals
    val t = manifest.agg(sum("n_docs"), sum("n_tokens")).head()
    val wt = graft.queries.Shards.packShards(docs, 512)
      .agg(count(lit(1)), sum("n_tokens")).head()
    assert(t.getLong(0) == wt.getLong(0) && t.getLong(1) == wt.getLong(1))
  }

  test("shard geometry: every shard except the last starts under budget and spills at most one doc") {
    val dir = tmpDir("shards_geom")
    Sinks.writeShards(docs, dir, budget = 512)
    val geom = Sinks.readShards(spark, dir).groupBy("shard_id")
      .agg(sum("n_tokens").as("tok"), max("n_tokens").as("mx"))
    // a shard holds the docs whose pack START falls in its budget
    // window, so its token sum is < budget + its largest doc
    assert(geom.filter(col("tok") >= lit(512L) + col("mx")).isEmpty)
  }

  test("verifyShards passes on an intact artifact and flags a doctored manifest") {
    val dir = tmpDir("shards_verify")
    val manifest = Sinks.writeShards(docs, dir, budget = 512)
    assert(Sinks.verifyShards(spark, dir).isEmpty)
    val doctored = manifest.withColumn("fingerprint",
      when(col("shard_id") === 0L, col("fingerprint") + 1L)
        .otherwise(col("fingerprint")))
    val bad = Sinks.diffManifest(Sinks.readShards(spark, dir), doctored)
      .collect().map(_.getLong(0)).toSeq
    assert(bad == Seq(0L), s"flagged: $bad")
    // a missing manifest row flags too
    val truncated = manifest.filter(col("shard_id") =!= 1L)
    val bad2 = Sinks.diffManifest(Sinks.readShards(spark, dir), truncated)
      .collect().map(_.getLong(0)).toSeq
    assert(bad2 == Seq(1L), s"flagged: $bad2")
  }

  test("produceShards: the capstone artifact holds exactly the produced corpus, in epoch order") {
    val dir = tmpDir("produce_shards")
    val train = docs.filter(col("doc_id") % 23 =!= 0)
    val eval = docs.filter(col("doc_id") % 23 === 0)
    val stops = Seq("the", "a", "of", "and", "to", "in", "is")
    Graft.produceShards(train, eval, dir,
      minWords = 10L, stops = stops, budget = 512L, seed = 42L)
    assert(Sinks.verifyShards(spark, dir).isEmpty)
    val back = Sinks.readShards(spark, dir)
    // same docs, positions, and token counts as the pipeline row
    val want = Graft.pipelineProduce(train, eval,
      minWords = 10L, stops = stops, seed = 42L)
      .select("doc_id", "pos", "n_tokens")
    assert(back.select("doc_id", "pos", "n_tokens").exceptAll(want).isEmpty &&
      want.exceptAll(back.select("doc_id", "pos", "n_tokens")).isEmpty)
    // shards are contiguous epoch slices: positions never interleave
    val ranges = back.groupBy("shard_id")
      .agg(min("pos").as("lo"), max("pos").as("hi"))
      .orderBy("shard_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    ranges.sliding(2).foreach {
      case Array((s1, _, hi1), (s2, lo2, _)) =>
        assert(hi1 < lo2, s"shards $s1/$s2 interleave: hi=$hi1 lo=$lo2")
      case _ =>
    }
    // the shard texts are the EXCISED texts (capstone rewrite applied),
    // never raw train text for any doc that lost tokens
    val excised = Graft.exciseSpans(
      graft.queries.Contamination.decontamGate(
        graft.queries.Dedup.exactSurvivors(
          train.join(
            graft.queries.TextAnalysis.gopherRules(train, minWords = 10L,
              stops = stops).filter(col("kept") === 1L).select("doc_id"),
            Seq("doc_id"), "left_semi")
          .join(graft.queries.TextAnalysis.gopherRepetition(train)
            .filter(col("kept") === 1L).select("doc_id"),
            Seq("doc_id"), "left_semi")),
        eval))
      .select(col("doc_id"), col("text_clean").as("text"))
    assert(back.select("doc_id", "text").exceptAll(excised).isEmpty &&
      excised.exceptAll(back.select("doc_id", "text")).isEmpty)
  }

  test("tokenized shards: ids round-trip, Σ len(tokens) is the manifest count, counts match H8b") {
    val dir = tmpDir("tok_shards")
    val manifest = Sinks.writeTokenizedShards(docs, dir, budget = 512)
    assert(Sinks.verifyShards(spark, dir).isEmpty)
    val back = Sinks.readShards(spark, dir)
    assert(back.count() == docs.count())
    // the manifest's n_tokens IS the token mass of the arrays, per shard
    val disagree = back.groupBy("shard_id")
      .agg(sum(size(col("tokens")).cast("long")).as("arr_mass"))
      .join(manifest, "shard_id")
      .filter(col("arr_mass") =!= col("n_tokens"))
    assert(disagree.isEmpty)
    // per-doc len(tokens) equals the H8b packing row's BPE count
    val h8b = graft.queries.Shards.packSequencesBpe(docs)
      .select(col("doc_id"), col("n_tokens").as("want"))
    val drift = back.select(col("doc_id"),
        size(col("tokens")).cast("long").as("got"))
      .join(h8b, "doc_id").filter(col("got") =!= col("want"))
    assert(drift.isEmpty)
    // budget geometry holds for token budgets too
    val geom = back.groupBy("shard_id")
      .agg(sum("n_tokens").as("tok"), max("n_tokens").as("mx"))
    assert(geom.filter(col("tok") >= lit(512L) + col("mx")).isEmpty)
  }

  test("tokenized shards: ids decode back to the corpus words") {
    import spark.implicits._
    val dir = tmpDir("tok_decode")
    Sinks.writeTokenizedShards(docs, dir, budget = 512)
    val vocabDf = graft.queries.Tokenizer
      .vocab(graft.queries.Tokenizer.FixedMerges)
      .toDF("sym", "id")
    // decoded = per-doc concat of each token's symbol, in token order;
    // expected = concat of the doc's words, each with the </w> marker
    // (encodeWord concatenates back to exactly word + </w>)
    val decoded = Sinks.readShards(spark, dir)
      .select(col("doc_id"), posexplode_outer(col("tokens")).as(Seq("p", "id")))
      .join(vocabDf, Seq("id"), "left")
      .groupBy("doc_id")
      .agg(concat_ws("", transform(
        array_sort(collect_list(struct(col("p"), col("sym")))),
        s => s("sym"))).as("got"))
    val expected = docs.select(col("doc_id"),
      concat_ws("", transform(
        graft.functions.TextFunctions.words(col("text")),
        w => concat(w, lit(graft.queries.Tokenizer.EndOfWord)))).as("want"))
    assert(decoded.join(expected, "doc_id")
      .filter(col("got") =!= col("want")).isEmpty)
  }

  test("the fingerprint covers the token arrays: a flipped id flags its shard") {
    val dir = tmpDir("tok_tamper")
    Sinks.writeTokenizedShards(docs, dir, budget = 512)
    val tampered = Sinks.readShards(spark, dir)
      .withColumn("tokens",
        when(col("shard_id") === 2L, concat(col("tokens"), array(lit(-1))))
          .otherwise(col("tokens")))
    val bad = Sinks.diffManifest(tampered,
        spark.read.parquet(s"$dir/manifest"))
      .collect().map(_.getLong(0)).toSeq
    assert(bad == Seq(2L), s"flagged: $bad")
  }

  test("produceShards(tokenize = true): certified ids over the produced corpus") {
    val dir = tmpDir("produce_tok")
    val train = docs.filter(col("doc_id") % 23 =!= 0)
    val eval = docs.filter(col("doc_id") % 23 === 0)
    val stops = Seq("the", "a", "of", "and", "to", "in", "is")
    Graft.produceShards(train, eval, dir,
      minWords = 10L, stops = stops, budget = 512L, seed = 42L,
      tokenize = true)
    assert(Sinks.verifyShards(spark, dir).isEmpty)
    val back = Sinks.readShards(spark, dir)
    // the ids are counted by the SAME encoder that budgeted the shards
    assert(back.filter(size(col("tokens")).cast("long") =!= col("n_tokens")).isEmpty)
    // identical production decisions to the text-only artifact
    val want = Graft.pipelineProduce(train, eval,
      minWords = 10L, stops = stops, seed = 42L)
      .select("doc_id", "pos", "n_tokens")
    assert(back.select("doc_id", "pos", "n_tokens").exceptAll(want).isEmpty &&
      want.exceptAll(back.select("doc_id", "pos", "n_tokens")).isEmpty)
  }

  test("fingerprints are write-order independent (two writes agree)") {
    val d1 = tmpDir("shards_a")
    val d2 = tmpDir("shards_b")
    val m1 = Sinks.writeShards(docs, d1, budget = 512).collect().toSet
    val m2 = Sinks.writeShards(docs.repartition(17), d2, budget = 512)
      .collect().toSet
    assert(m1.map(_.toSeq) == m2.map(_.toSeq))
  }

  test("byte-token shards: artifact ≡ tokenizeDocsBytes + H8c prefix-sum, bit for bit") {
    import graft.queries.ByteTokenizer
    val dir = tmpDir("shards_bytes")
    Sinks.writeTokenizedShardsBytes(docs, dir, budget = 512L)
    assert(Sinks.verifyShards(spark, dir).isEmpty)
    val back = Sinks.readShards(spark, dir)
    // ids and counts: exactly the C30 encoder's output, doc for doc
    val want = ByteTokenizer.tokenizeDocsBytes(docs,
      ByteTokenizer.LearnedByteMerges)
    assert(back.select("doc_id", "tokens", "n_tokens")
      .exceptAll(want.select("doc_id", "tokens", "n_tokens")).isEmpty &&
      want.select("doc_id", "tokens", "n_tokens")
        .exceptAll(back.select("doc_id", "tokens", "n_tokens")).isEmpty)
    // budgets counted in byte tokens: the H4 prefix sum over the C30
    // counts in doc_id order reproduces every shard assignment
    val assigned = graft.ops.ScaleOps.prefixSum(
        want.select(col("doc_id"), col("n_tokens")),
        "doc_id", "n_tokens", "cum")
      .select(col("doc_id"), expr("(cum - n_tokens) div 512").as("shard_id"))
    assert(back.select("doc_id", "shard_id").exceptAll(assigned).isEmpty)
    // whitespace is priced: every word run AND every whitespace run
    // contributes >= 1 token, so byte-token counts strictly exceed the
    // corpus word count (the word-BPE artifact's floor, which prices
    // separators at zero)
    val (bTok, nWords) = (
      back.agg(sum("n_tokens")).head().getLong(0),
      docs.agg(sum(size(graft.functions.TextFunctions.words(col("text")))
        .cast("long"))).head().getLong(0))
    assert(bTok > nWords,
      s"byte tokens $bTok must out-count bare words $nWords (separators priced)")
  }

  test("byte-token shards: every shard's ids decode back to its exact text") {
    import graft.queries.ByteTokenizer
    val dir = tmpDir("shards_bytes_rt")
    Sinks.writeTokenizedShardsBytes(docs.filter(col("doc_id") < 40), dir)
    Sinks.readShards(spark, dir)
      .select("doc_id", "text", "tokens").collect().foreach { r =>
        val back = ByteTokenizer.decode(r.getSeq[Int](2),
          ByteTokenizer.LearnedByteMerges)
        assert(back == r.getString(1),
          s"doc ${r.getLong(0)}: decoded artifact ids != stored text")
      }
  }

  test("produceShards(byteTokens = true): UNK-free certified ids, honest byte budgets") {
    import graft.queries.ByteTokenizer
    val dir = tmpDir("produce_bytes")
    val train = docs.filter(col("doc_id") % 23 =!= 0)
    val eval = docs.filter(col("doc_id") % 23 === 0)
    val stops = Seq("the", "a", "of", "and", "to", "in", "is")
    Graft.produceShards(train, eval, dir,
      minWords = 10L, stops = stops,
      merges = ByteTokenizer.LearnedByteMerges,
      budget = 512L, seed = 42L, tokenize = true, byteTokens = true)
    assert(Sinks.verifyShards(spark, dir).isEmpty)
    val back = Sinks.readShards(spark, dir)
    // one encoder for budgets AND arrays: len(tokens) == n_tokens
    assert(back.filter(size(col("tokens")).cast("long") =!= col("n_tokens")).isEmpty)
    // the ids decode to the PRODUCED (gated/deduped/excised) text —
    // the artifact round-trips the corpus it certifies
    back.select("doc_id", "text", "tokens").collect().foreach { r =>
      val dec = ByteTokenizer.decode(r.getSeq[Int](2),
        ByteTokenizer.LearnedByteMerges)
      assert(dec == r.getString(1),
        s"doc ${r.getLong(0)}: produced-artifact ids != produced text")
    }
    // same production decisions as the word-BPE artifact (gates are
    // tokenizer-independent); only the token arithmetic changes
    val wordDir = tmpDir("produce_words")
    Graft.produceShards(train, eval, wordDir,
      minWords = 10L, stops = stops, budget = 512L, seed = 42L)
    val wordBack = Sinks.readShards(spark, wordDir)
    assert(back.select("doc_id", "pos").exceptAll(
      wordBack.select("doc_id", "pos")).isEmpty &&
      wordBack.select("doc_id", "pos").exceptAll(
        back.select("doc_id", "pos")).isEmpty)
  }
}
