package graft

import graft.queries.Tokenizer
import org.apache.spark.sql.functions._

/** BPE trainer/encoder contract (C13) against the hand-computable
  * classic corpus from Sennrich et al. '16: low×5, lower×2, newest×6,
  * widest×3. Pair counts are fully derivable by hand, so the expected
  * merge sequence — including the deterministic (count DESC, pair ASC)
  * tie-breaks — is pinned exactly. */
class TokenizerSpec extends SparkSpec {

  import spark.implicits._

  private val W = Tokenizer.EndOfWord

  private lazy val docs = {
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    Seq((1L, text)).toDF("doc_id", "text")
  }

  test("merge sequence matches the hand computation, ties broken deterministically") {
    val merges = Tokenizer.bpeLearnMerges(docs, merges = 4)
    // counts: (e,s)=(s,t)=(t,</w>)=9 tie -> lexicographic: (e,s) first;
    // then (es,t)=9 beats (t,</w>)=9 lexicographically; then
    // (est,</w>)=9; then (l,o)=(o,w)=7 tie -> (l,o)
    assert(merges.map(_._1) == Seq(
      ("e", "s"), ("es", "t"), ("est", W), ("l", "o")))
    assert(merges.map(_._2) == Seq("es", "est", s"est$W", "lo"))
  }

  test("greedy encoding applies merges by rank: 'lowest' -> lo w est</w>") {
    val merges = Tokenizer.bpeLearnMerges(docs, merges = 4)
    val ranks = merges.map(_._1).zipWithIndex.toMap
    assert(Tokenizer.encodeWord("lowest", ranks) == Vector("lo", "w", s"est$W"))
    // unseen characters pass through as singletons
    assert(Tokenizer.encodeWord("xy", ranks) == Vector("x", "y", W))
  }

  test("merge loop stops when no pair remains; empty corpus learns nothing") {
    // single repeated char: 'aa' has pairs (a,a) then (aa,</w>) then done
    val tiny = Seq((1L, "aa aa")).toDF("doc_id", "text")
    val m = Tokenizer.bpeLearnMerges(tiny, merges = 10)
    assert(m.length == 2, s"expected exhaustion after 2 merges, got $m")
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Tokenizer.bpeLearnMerges(empty, merges = 3).isEmpty)
  }

  test("bpeStats: per-doc fertility from distinct-word encoding") {
    val two = Seq(
      (1L, "low low lowest"),
      (2L, "newest")).toDF("doc_id", "text")
    val merges = Tokenizer.bpeLearnMerges(docs, merges = 4)
    val got = Tokenizer.bpeStats(two, merges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // low -> [lo, w</w>]? no: merges are (e,s),(es,t),(est,</w>),(l,o):
    // low = l o w </w> -> lo w </w> = 3 tokens; lowest -> lo w est</w> = 3
    assert(got(1L) == ((3L, 9L)), s"doc 1: ${got(1L)}")
    // newest = n e w e s t </w> -> n e w est</w> = 4 tokens
    assert(got(2L) == ((1L, 4L)), s"doc 2: ${got(2L)}")
  }

  test("learned merge table frame carries rank order") {
    val df = Tokenizer.bpeLearn(docs, merges = 4).collect()
    assert(df.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(df.head.getString(3) == "es")
  }

  test("encoding round-trip: concatenated tokens reconstruct the word") {
    val merges = Tokenizer.bpeLearnMerges(docs, merges = 4)
    val enc = Tokenizer.bpeEncodeWords(docs, merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1))
    assert(enc.nonEmpty)
    for ((w, toks) <- enc)
      assert(toks.mkString.stripSuffix(W) == w, s"$w -> $toks")
  }

  test("fuzz: reconstruction and determinism hold for arbitrary words under a fuzzed vocab") {
    val rnd = new scala.util.Random(0xBEEF)
    def randWord(): String =
      (1 to (1 + rnd.nextInt(12))).map(_ => ('a' + rnd.nextInt(6)).toChar).mkString
    val corpus = Seq.fill(300)(randWord())
    val fuzzDocs = corpus.grouped(20).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    val merges = Tokenizer.bpeLearnMerges(fuzzDocs, merges = 60)
    assert(merges == Tokenizer.bpeLearnMerges(fuzzDocs, merges = 60),
      "fuzzed merge sequence not deterministic")
    val ranks = merges.map(_._1).zipWithIndex.toMap
    // encode corpus words AND unseen words: reconstruction must hold
    // for both, and every emitted token must be a vocab symbol (a
    // single char, </w>, or a learned merge product)
    val vocab = merges.map(_._2).toSet ++ ('a' to 'f').map(_.toString) + W
    for (w <- corpus.distinct ++ Seq.fill(100)(randWord())) {
      val toks = Tokenizer.encodeWord(w, ranks)
      assert(toks.mkString.stripSuffix(W) == w, s"$w -> $toks")
      for (t <- toks)
        assert(vocab.contains(t) || vocab.contains(t.stripSuffix(W)),
          s"token $t of $w is not a vocab symbol")
    }
  }

  test("incremental trainer is merge-for-merge identical to the naive recount loop") {
    val rnd = new scala.util.Random(0xF00D)
    def randWord(alpha: Int, maxLen: Int): String =
      (1 to (1 + rnd.nextInt(maxLen))).map(_ => ('a' + rnd.nextInt(alpha)).toChar).mkString
    // small alphabets + repeated chars force dense ties and the
    // overlapping-pair edge cases ("aaaa") where incremental
    // bookkeeping schemes classically drift from the recount truth
    val dicts = Seq(
      Array("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L),
      Array("aaaa" -> 7L, "aaab" -> 3L, "baaa" -> 2L, "abab" -> 5L),
      Array.fill(120)(randWord(3, 8)).distinct.map(w => w -> (1L + rnd.nextInt(9))),
      Array.fill(200)(randWord(6, 14)).distinct.map(w => w -> (1L + rnd.nextInt(50))))
    for ((dict, di) <- dicts.zipWithIndex; m <- Seq(1, 7, 40, 400)) {
      val inc = Tokenizer.learnFromDict(dict, m)
      val naive = Tokenizer.learnFromDictNaive(dict, m)
      assert(inc == naive,
        s"dict #$di, merges=$m: incremental diverged at merge " +
          s"${inc.zip(naive).indexWhere { case (a, b) => a != b }}: " +
          s"inc=${inc.take(5)} naive=${naive.take(5)}")
    }
  }

  test("the committed LearnedMerges table reproduces from sf0.1 bit-for-bit") {
    // the C19 oracle row replays this exact table; a drifted commit
    // (stale regeneration, hand edit) would silently re-pin the oracle
    // to a tokenizer the trainer no longer produces. Budget 512 is
    // deliberately unreachable: the 31-word synthetic vocab exhausts
    // the trainer at 107 merges, and the committed prefix stops at 96
    // to keep fertility variation (see Tokenizer.LearnedMerges doc).
    val learned = Tokenizer.bpeLearnMerges(
      Tables.documents(spark, "/root/testdata/sf0.1"), 512)
    assert(learned.size == 107, s"trainer exhaustion moved: ${learned.size}")
    assert(learned.take(96) == Tokenizer.LearnedMerges,
      "committed LearnedMerges no longer matches the trainer output — " +
        "regenerate with `runMain graft.LearnMerges /root/testdata/sf0.1 512`")
  }
}
