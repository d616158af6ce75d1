package graft

import graft.queries.{Tokenizer, Unigram}
import org.apache.spark.sql.functions._

/** C27 [[Unigram]] — the unigram-LM tokenizer contract: the EM trainer
  * on a hand-computed example, Viterbi tie-breaks, determinism /
  * partitioning invariance, trainer-vs-committed-table equality (the
  * H8b artifact posture), UNK handling, and the corpus encoder's
  * reassembly invariants. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed EM: whole-word piece wins, floor keeps chars, ids by (count, piece)") {
    // dict: "abab"x10, "ab"x5. Round 1 scores come from substring
    // counts (total 125): q(abab)=ln .08 beats [ab,ab]=2 ln .2, so
    // Viterbi keeps the whole words; re-count gives abab:10, ab:5,
    // chars floored at 1. Final order (count DESC, piece ASC):
    // abab, ab, a, b -> ids 1..4.
    val pieces = Unigram.learnFromDict(
      Array(("abab", 10L), ("ab", 5L)),
      vocabSize = 4, maxPieceLen = 4, emIters = 2)
    assert(pieces.map(_._1) == Seq("abab", "ab", "a", "b"), pieces)
    assert(Unigram.encodeWord("abab", pieces, 4) == Vector(1))
    assert(Unigram.encodeWord("ab", pieces, 4) == Vector(2))
    assert(Unigram.encodeWord("ba", pieces, 4) == Vector(4, 3))
  }

  test("viterbi tie-break: equal total score goes to the longer last piece") {
    val pieces = Seq(("ab", -10L), ("a", -5L), ("b", -5L))
    // [a, b] totals -10, [ab] totals -10 -> longer piece wins
    assert(Unigram.encodeWord("ab", pieces) == Vector(1))
  }

  test("OOV chars step through UNK (id 0) without breaking the path") {
    val pieces = Seq(("ab", -10L), ("a", -5L), ("b", -5L))
    assert(Unigram.encodeWord("azb", pieces) == Vector(2, 0, 3))
    assert(Unigram.encodeWord("", pieces) == Vector.empty)
  }

  test("trainer is deterministic, partitioning-invariant, and reproduces the committed table") {
    val docs = Tables.documents(spark, sfDir)
    val a = Unigram.learnPieces(docs, vocabSize = 40)
    val b = Unigram.learnPieces(docs.repartition(7), vocabSize = 40)
    assert(a == b)
    assert(a == Unigram.FixedPieces,
      "trainer no longer reproduces LearnedPiecesTable — rerun " +
        "`runMain graft.LearnPieces /root/testdata/sf0.001 40` and recommit")
  }

  test("vocabSize below the character floor fails loudly") {
    val e = intercept[IllegalArgumentException] {
      Unigram.learnFromDict(Array(("abc", 1L)), vocabSize = 2,
        maxPieceLen = 3, emIters = 1)
    }
    assert(e.getMessage.contains("coverage floor"))
  }

  test("corpus encoder: word-order reassembly, wordless docs empty, counts consistent") {
    val docs = Seq(
      (1L, "scan the window"),
      (2L, ""),
      (3L, "window scan")).toDF("doc_id", "text")
    val out = Unigram.tokenizeDocsUnigram(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[Int](1).toVector, r.getLong(2))).toMap
    val scan = Unigram.encodeWord("scan", Unigram.FixedPieces)
    val the = Unigram.encodeWord("the", Unigram.FixedPieces)
    val window = Unigram.encodeWord("window", Unigram.FixedPieces)
    assert(out(1L)._1 == scan ++ the ++ window)
    assert(out(2L) == ((Vector.empty, 0L)))
    assert(out(3L)._1 == window ++ scan)
    assert(out.forall { case (_, (t, n)) => t.size.toLong == n })
  }

  test("fertility comparison row discriminates the two tokenizer families") {
    val cmp = Unigram.tokenizerCompare(Tables.documents(spark, sfDir))
      .agg(sum("n_words"), sum("n_bpe"), sum("n_uni")).head()
    val (w, bpe, uni) = (cmp.getLong(0), cmp.getLong(1), cmp.getLong(2))
    // both encoders leave real segmentation mass (neither saturated to
    // 1 token/word) and the row separates them — the measurement the
    // comparison exists for. Direction is a BUDGET artifact, not a
    // family property: the committed 64-merge BPE table out-compresses
    // the committed 40-piece unigram table on this corpus (64164 vs
    // 74303 tokens at sf0.001), exactly the trade-off a mix designer
    // reads off this row.
    assert(w > 0 && bpe > w && uni > w, s"degenerate census ($w, $bpe, $uni)")
    assert(bpe != uni, "comparison row shows no separation")
  }
}
