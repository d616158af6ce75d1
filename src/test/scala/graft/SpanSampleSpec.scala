package graft

/** D14 [[graft.queries.Dedup.dupSpans]] and H11
  * [[graft.queries.Shards.weightedSample]] on hand-built frames:
  * exact span extents, self-repetition, weight bias, zero-weight
  * exclusion, partitioning invariance, seed sensitivity. */
class SpanSampleSpec extends SparkSpec {
  import spark.implicits._

  test("dupSpans finds a planted cross-doc span with exact extent") {
    // both docs contain the 6-token run "one two three four five six"
    // at different offsets; with n=5 its duplicated 5-gram starts are
    // {p, p+1}, merging to one span covering the whole run
    val docs = Seq(
      (1L, "alpha beta one two three four five six gamma"),
      (2L, "one two three four five six zeta eta theta iota"))
      .toDF("doc_id", "text")
    val spans = Graft.dupSpans(docs, n = 5).collect().toSeq.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(spans == Seq((1L, 3L, 8L, 2L), (2L, 1L, 6L, 2L)), spans)
  }

  test("dupSpans unions overlapping intervals from non-consecutive dup starts") {
    // doc 1's grams at p=1 ("a b c d e") and p=3 ("c d e f g") each
    // match another doc, but the middle gram at p=2 ("b c d e f")
    // matches nothing — the two covering intervals [1,5] and [3,7]
    // overlap and must merge to ONE maximal span [1,7], not two
    // overlapping rows
    val docs = Seq(
      (1L, "a b c d e f g"),
      (2L, "z1 z2 a b c d e"),
      (3L, "c d e f g q1 q2"))
      .toDF("doc_id", "text")
    val spans = Graft.dupSpans(docs, n = 5).collect().toSeq.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(spans == Seq((1L, 1L, 7L, 2L), (2L, 3L, 7L, 1L), (3L, 1L, 5L, 1L)),
      spans)
  }

  test("dupSpans counts self-repetition inside one doc; unique docs yield nothing") {
    val docs = Seq(
      (1L, "x y z w v a b c x y z w v"), // "x y z w v" repeats at 1 and 9
      (2L, "totally unrelated words here only once appearing"))
      .toDF("doc_id", "text")
    val spans = Graft.dupSpans(docs, n = 5).collect().toSeq.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(spans == Seq((1L, 1L, 5L, 1L), (1L, 9L, 13L, 1L)), spans)
  }

  test("dupSpans is partitioning-invariant") {
    val docs = (0L until 40L).map(i =>
      (i, if (i % 10 == 0) "p q r s t u v w"
          else s"unique$i words nothing shared x$i y$i z$i w$i"))
      .toDF("doc_id", "text")
    val a = Graft.dupSpans(docs.repartition(1), n = 5).collect().toSeq
    val b = Graft.dupSpans(docs.repartition(7), n = 5).collect().toSeq
    assert(a == b && a.nonEmpty)
    graft.ops.Release.sweep(spark)
  }

  test("weightedSample: deterministic, partitioning-invariant, seed-sensitive") {
    val docs = (1L to 200L)
      .map(i => (i, Seq.fill((i % 17 + 1).toInt)("tok").mkString(" ")))
      .toDF("doc_id", "text")
    val a = Graft.weightedSample(docs.repartition(1), k = 10, seed = 3L).collect().toSeq
    val b = Graft.weightedSample(docs.repartition(8), k = 10, seed = 3L).collect().toSeq
    assert(a == b && a.size == 10)
    val c = Graft.weightedSample(docs, k = 10, seed = 4L).collect().toSeq
    assert(a.map(_.getLong(0)).toSet != c.map(_.getLong(0)).toSet,
      "adjacent seeds must yield different draws")
  }

  test("weightedSample favors weight and excludes token-less docs") {
    // P(a 2-token doc outranks the 5000-token doc) ≈ 0.8% per doc —
    // the pinned seed-0 draw must include the heavy doc and never the
    // empty one
    val docs = (Seq((1L, Seq.fill(5000)("big").mkString(" ")), (99L, "")) ++
      (2L to 40L).map(i => (i, "a b"))).toDF("doc_id", "text")
    val ids = Graft.weightedSample(docs, k = 5, seed = 0L)
      .collect().map(_.getLong(0)).toSet
    assert(ids.contains(1L), s"heavy doc missing from $ids")
    assert(!ids.contains(99L), "token-less doc must be excluded")
  }
}
