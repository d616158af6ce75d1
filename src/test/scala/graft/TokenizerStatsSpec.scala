package graft

import graft.queries.Tokenizer

/** C19 [[graft.queries.TokenizerStats.bpeFertility]]: the distributed
  * census against a driver-side replay of the same encoder, slices with
  * no words at all, and the single-division float contract. */
class TokenizerStatsSpec extends SparkSpec {
  import spark.implicits._

  private val merges = Tokenizer.FixedMerges
  private val ranks = merges.map(_._1).zipWithIndex.toMap

  test("census equals a driver-side encoder replay per source") {
    val docs = Seq(
      (1L, "the quick brown fox", "a"),
      (2L, "the the the", "a"),
      (3L, "jumped over lazy dogs", "b"),
      (4L, "", "c"), // wordless doc: counts as a doc, contributes no words
      (5L, "singleword", "c"))
      .toDF("doc_id", "text", "source")
    val out = Graft.bpeFertility(docs).collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5), r.getDouble(6))).toMap

    // independent replay: split on letter runs, encode each word
    val bySource = Seq(
      "a" -> Seq("the", "quick", "brown", "fox", "the", "the", "the"),
      "b" -> Seq("jumped", "over", "lazy", "dogs"),
      "c" -> Seq("singleword"))
    val expected = bySource.map { case (src, ws) =>
      val nBpe = ws.map(w => Tokenizer.encodeWord(w, ranks).length.toLong).sum
      val nChars = ws.map(_.length.toLong).sum
      src -> (ws.size.toLong, nChars, nBpe,
        nBpe.toDouble / ws.size, nChars.toDouble / nBpe)
    }.toMap
    for ((src, (nw, nc, nb, fert, cpt)) <- expected) {
      val (_, w, c, b, f, t) = out(src)
      assert((w, c, b) == (nw, nc, nb), s"counts for $src")
      assert(f == fert && t == cpt, s"ratios for $src")
    }
    assert(out("a")._1 == 2L && out("c")._1 == 2L, "doc counts include wordless docs")
  }

  test("an all-wordless source reports zeros, not nulls or NaN") {
    val docs = Seq((1L, "1234 !!", "empty"), (2L, "real words here", "full"))
      .toDF("doc_id", "text", "source")
    val out = Graft.bpeFertility(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(5)))
      .toMap
    assert(out("empty") == (1L, 0L, 0.0))
    assert(out("full")._2 == 3L)
  }

  test("fertility census is partitioning-invariant") {
    val docs = Tables.documents(spark, sfDir)
    val a = Graft.bpeFertility(docs).collect().toSeq
    val b = Graft.bpeFertility(docs.repartition(13)).collect().toSeq
    assert(a == b)
  }
}
