package graft

/** D21 [[graft.queries.SuffixDedup.dupSpansSuffix]]: the suffix-array
  * rank-doubling ExactSubstr must agree with the md5-gram form
  * (D14b) span-for-span — on planted cases, on adversarial
  * shared-prefix strings, and on the real corpus — while using no
  * hash anywhere in the decision path. */
class SuffixDedupSpec extends SparkSpec {
  import spark.implicits._

  private def spans(df: org.apache.spark.sql.DataFrame) =
    df.collect().toSeq.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  test("exact extents on a planted mid-doc duplicate (D14b's case)") {
    val shared = "0123456789ABCDEFGHIJKLMNOPQRS!"
    val docs = Seq(
      (1L, "aaaaaaaaaa" + shared + "zzzzzzzzzz"),
      (2L, "bbbbbbbbbb" + shared + "yyyyyyyyyy"))
      .toDF("doc_id", "text")
    val out = spans(Graft.dupSpansSuffix(docs, k = 20))
    assert(out == Seq((1L, 11L, 40L, 11L), (2L, 11L, 40L, 11L)), out)
  }

  test("agrees with the md5-gram form on adversarial near-miss prefixes") {
    // strings engineered to agree on long prefixes and diverge at
    // char k-1, k, k+1 — the boundary the overlapping final windows
    // must resolve exactly; plus self-repetition and a doc of one
    // repeated char (maximally overlapping duplicated grams)
    val k = 7
    val docs = Seq(
      (1L, "abcdefXabcdefY"),        // "abcdefX" at 1 shared with 2/4; the
                                     // copy at 8 diverges at char 7 ("Y")
      (2L, "abcdefXabcdefX"),        // 7-char repeat within one doc
      (3L, "zzzzzzzzzzzzzzzz"),      // 16x one char: every gram duplicated
      (4L, "abcdefXtrailing data"),  // shares the 7-gram with doc 2
      (5L, "short"),                 // < k: no output
      (6L, ""))                      // empty
      .toDF("doc_id", "text")
    val sa = spans(graft.queries.SuffixDedup.dupSpansSuffix(docs, k))
    val md = spans(graft.queries.Dedup.dupSpansChar(docs, k))
    assert(sa == md, s"sa=$sa md=$md")
    assert(sa.map(_._1).toSet == Set(1L, 2L, 3L, 4L), sa)
    // doc 1's span covers only the FIRST "abcdef?" copy extended to
    // char 13 ("abcdef" + one more shared char reaches 12+1): the
    // second copy's 7-gram "abcdefY" occurs once -> grams starting
    // at 8 are unique, span = [1, 13]
    assert(sa.find(_._1 == 1L).get == ((1L, 1L, 13L, 7L)), sa)
  }

  test("differential vs D14b on the sf0.001 corpus, two gram widths") {
    val docs = Tables.documents(spark, sfDir)
    for (k <- Seq(12, 20)) {
      val sa = spans(graft.queries.SuffixDedup.dupSpansSuffix(docs, k))
      val md = spans(graft.queries.Dedup.dupSpansChar(docs, k))
      assert(sa == md, s"k=$k: ${sa.size} vs ${md.size} spans")
      assert(sa.nonEmpty, s"k=$k: premise — corpus must have dup spans")
    }
  }

  test("k=2 degenerate single round; null text treated as empty") {
    val docs = Seq((1L, "abab"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val sa = spans(graft.queries.SuffixDedup.dupSpansSuffix(docs, k = 2))
    val md = spans(graft.queries.Dedup.dupSpansChar(docs, k = 2))
    assert(sa == md, s"sa=$sa md=$md")
    // grams: "ab"(1), "ba"(2), "ab"(3) — dup starts {1, 3}, gap
    // 2 <= k, so one merged span [1, 4] with 2 merged starts
    assert(sa == Seq((1L, 1L, 4L, 2L)), sa)
  }

  test("non-ASCII text fails loudly instead of aliasing the base pack") {
    val docs = Seq((1L, "plain ascii text here, long enough to gram"),
      (2L, "café au lait répété café au lait"))
      .toDF("doc_id", "text")
    val e = intercept[Exception] {
      graft.queries.SuffixDedup.dupSpansSuffix(docs, k = 10).collect()
    }
    assert(e.getMessage.contains("non-ASCII"), e.getMessage)
    // all-ASCII input with the same shape still runs clean
    val ok = graft.queries.SuffixDedup.dupSpansSuffix(
      docs.filter($"doc_id" === 1L), k = 10)
    assert(ok.collect().isEmpty)
  }

  test("partitioning invariance: same spans under adversarial repartition") {
    val docs = Tables.documents(spark, sfDir).repartition(13)
    val sa = spans(graft.queries.SuffixDedup.dupSpansSuffix(docs, k = 20))
    val md = spans(graft.queries.Dedup.dupSpansChar(
      Tables.documents(spark, sfDir), k = 20))
    assert(sa == md)
  }
}
