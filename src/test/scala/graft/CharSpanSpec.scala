package graft

/** D14b [[graft.queries.Dedup.dupSpansChar]]: char-granularity
  * ExactSubstr audit — planted extents, the word-gram fidelity gap
  * (a duplicated run word tokenization can't see), short-text edges,
  * and partitioning invariance. */
class CharSpanSpec extends SparkSpec {
  import spark.implicits._

  private def spans(df: org.apache.spark.sql.DataFrame) =
    df.collect().toSeq.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  test("plants a duplicated run word-grams provably miss") {
    // the 26-char run is ONE word in doc 1 but split "abcde fgh..." in
    // doc 2 — word-5-grams see entirely different token sequences in
    // BOTH docs (doc 1: a single word; doc 2: words not repeated 5 in
    // a row anywhere else), so the word-level audit finds nothing; the
    // char-level audit must flag the shared character run
    val run = "abcdefghijklmnopqrstuvwxyz"
    val docs = Seq(
      (1L, s"prefix one $run suffix one"),
      (2L, s"totally different frame $run closing words here"))
      .toDF("doc_id", "text")
    val word = spans(Graft.dupSpans(docs, n = 5))
    assert(word.isEmpty, s"premise: word-grams must miss this, got $word")
    val char = spans(Graft.dupSpansChar(docs, k = 20))
    assert(char.map(_._1).toSet == Set(1L, 2L), char)
    // each doc's span covers its copy of the run (doc 1's sits at
    // chars 12..37); incidental shared BOUNDARY chars ("e " precedes
    // the run in both docs, a space follows) legitimately extend the
    // span by a few chars — covered-char union semantics
    val d1 = char.find(_._1 == 1L).get
    assert(d1._2 <= 12L && d1._3 >= 12L + run.length - 1 &&
      d1._3 - d1._2 + 1 <= run.length + 4, d1)
    val d2 = char.find(_._1 == 2L).get
    val len2 = d2._3 - d2._2 + 1
    assert(len2 >= run.length && len2 <= run.length + 4, d2)
  }

  test("exact extents on a planted mid-doc duplicate, k-gram census") {
    // chars 11..40 (30 chars) shared; k=20 -> 11 duplicated grams per
    // doc merging into one span of exactly [11, 40]
    val shared = "0123456789ABCDEFGHIJKLMNOPQRS!"
    val docs = Seq(
      (1L, "aaaaaaaaaa" + shared + "zzzzzzzzzz"),
      (2L, "bbbbbbbbbb" + shared + "yyyyyyyyyy"))
      .toDF("doc_id", "text")
    val out = spans(Graft.dupSpansChar(docs, k = 20))
    assert(out == Seq((1L, 11L, 40L, 11L), (2L, 11L, 40L, 11L)), out)
  }

  test("self-repetition inside one doc; texts shorter than k emit nothing") {
    val rep = "the exact same twenty!" // 22 chars, repeated within doc 1
    val docs = Seq(
      (1L, rep + "-----" + rep),
      (2L, "short"))
      .toDF("doc_id", "text")
    val out = spans(Graft.dupSpansChar(docs, k = 20))
    assert(out.map(_._1).toSet == Set(1L), out)
    // both copies are covered (two disjoint spans or one merged span
    // depending on the gap rule: starts 1 and 28, gap 27 > k=20 -> two)
    assert(out.size == 2 && out.forall(s => s._3 - s._2 + 1 >= rep.length), out)
  }

  test("is partitioning-invariant") {
    val base = "a shared duplicated character run of decent length here"
    val docs = (0L until 30L).map(i =>
      (i, if (i % 3 == 0) s"doc$i $base tail$i" else s"unique text body number $i with nothing repeated at all $i"))
      .toDF("doc_id", "text")
    val a = spans(Graft.dupSpansChar(docs.repartition(1), k = 20))
    val b = spans(Graft.dupSpansChar(docs.repartition(7), k = 20))
    assert(a == b && a.nonEmpty)
    graft.ops.Release.sweep(spark)
  }
}
