package graft

import graft.queries.Dedup

/** D20 [[Dedup.exciseSentenceSpans]] under the PAPER defaults (n = 3,
  * terminal-punctuation sentences) on planted cross-page and
  * self-repetition cases — the oracle row runs the n = 1 newline
  * parameterization; the C4 three-sentence semantics are pinned here. */
class SentenceSpanSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: (Long, String)*): Map[Long, (Long, Long, String)] =
    Dedup.exciseSentenceSpans(rows.toSeq.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap

  test("a three-sentence run shared across docs survives only at its first occurrence") {
    val out = run(
      1L -> "Aa bb cc. Bb cc dd. Cc dd ee. Dd ee ff.",
      2L -> "Xx yy zz. Aa bb cc. Bb cc dd. Cc dd ee. Yy zz ww.")
    assert(out(1L) == ((4L, 0L, "Aa bb cc. Bb cc dd. Cc dd ee. Dd ee ff.")),
      s"the keeper doc must be untouched: $out")
    assert(out(2L) == ((5L, 3L, "Xx yy zz. Yy zz ww.")),
      s"the second occurrence's three sentences must be excised: $out")
  }

  test("a TWO-sentence shared run is below the n=3 rule and survives everywhere") {
    val out = run(
      1L -> "Aa bb cc. Bb cc dd. Qq rr ss. Tt uu vv.",
      2L -> "Xx yy zz. Aa bb cc. Bb cc dd. Yy zz ww.")
    assert(out.values.forall(_._2 == 0L),
      s"no 3-sentence gram repeats, nothing may be excised: $out")
  }

  test("intra-document repetition collapses to the first period") {
    val out = run(
      7L -> "Aa bb cc. Bb cc dd. Cc dd ee. Aa bb cc. Bb cc dd. Cc dd ee. Aa bb cc. Bb cc dd. Cc dd ee.")
    assert(out(7L) == ((9L, 6L, "Aa bb cc. Bb cc dd. Cc dd ee.")),
      s"self-repetition is exactly what ExactSubstr strips: $out")
  }

  test("oracle mode (n=1, newline sentences): blanks are not sentences, dups excise corpus-wide") {
    val out = Dedup.exciseSentenceSpans(
      Seq(1L -> "shared line one\n\nunique aa", 2L -> "unique bb\nshared line one")
        .toDF("doc_id", "text"),
      n = 1, splitRe = "\n")
    .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((2L, 0L, "shared line one unique aa")),
      s"keeper page intact, blank separator never counted: $out")
    assert(out(2L) == ((2L, 1L, "unique bb")),
      s"the re-occurring line must excise from the later page: $out")
  }

  test("null and empty text degrade to zero-sentence docs") {
    val out = run(1L -> null.asInstanceOf[String], 2L -> "", 3L -> "Aa bb cc.")
    assert(out(1L) == ((0L, 0L, "")) && out(2L) == ((0L, 0L, "")), out)
    assert(out(3L)._1 == 1L && out(3L)._2 == 0L, out)
    graft.ops.Release.sweep(spark)
  }
}
