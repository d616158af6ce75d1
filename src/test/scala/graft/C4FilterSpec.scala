package graft

/** C18 [[graft.queries.LineFilters.c4Filters]] under the PAPER-DEFAULT
  * config on planted multi-line pages — the oracle row runs a relaxed
  * config (the synthetic corpus is single-line and punctuation-free),
  * so the C4 semantics themselves (terminal punctuation, javascript
  * lines, lorem-ipsum/brace pages, the sentence-count gate) are pinned
  * here. */
class C4FilterSpec extends SparkSpec {
  import spark.implicits._

  private def run(
      docs: org.apache.spark.sql.DataFrame,
      minKeptLines: Long = 5L): Map[Long, (Long, Long, Long, Long, Long, String)] =
    Graft.c4Filters(docs, minKeptLines = minKeptLines).collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getString(6))).toMap

  private val cleanPage =
    "This is the first good sentence.\nAnd here is another fine line!\n" +
      "Is this a question line?\nHe said \"quoted words end lines\"\n" +
      "A fifth proper sentence here."

  test("a clean 5-sentence page survives intact") {
    val out = run(Seq((1L, cleanPage)).toDF("doc_id", "text"))
    assert(out(1L) == (5L, 5L, 0L, 0L, 1L, cleanPage))
  }

  test("lines without terminal punctuation are dropped") {
    val page = "A good terminal sentence.\nno punctuation on this line\n" +
      "Another good one!"
    val out = run(Seq((1L, page)).toDF("doc_id", "text"), minKeptLines = 1L)
    assert(out(1L) == (3L, 2L, 0L, 0L, 1L,
      "A good terminal sentence.\nAnother good one!"))
  }

  test("lines under the word minimum are dropped even when terminal") {
    val out = run(Seq((1L, "Too short.\nThis one is long enough."))
      .toDF("doc_id", "text"), minKeptLines = 1L)
    assert(out(1L)._6 == "This one is long enough.")
  }

  test("a line containing the word javascript is dropped (word, not substring)") {
    val page = "Please enable JavaScript to continue.\n" +
      "The word javascripting is not the word itself.\n" +
      "A perfectly normal sentence stays."
    val out = run(Seq((1L, page)).toDF("doc_id", "text"), minKeptLines = 1L)
    assert(out(1L)._6 ==
      "The word javascripting is not the word itself.\n" +
        "A perfectly normal sentence stays.")
  }

  test("lorem ipsum anywhere on the page kills the page, not just a line") {
    val page = cleanPage + "\nSome Lorem Ipsum boilerplate appeared here."
    val out = run(Seq((1L, page)).toDF("doc_id", "text"))
    val (_, nKept, hasPhrase, _, kept, _) = out(1L)
    assert(hasPhrase == 1L && kept == 0L && nKept >= 5L)
  }

  test("a curly brace kills the page") {
    val page = cleanPage + "\nfunction f() { return 1; } is code."
    val out = run(Seq((1L, page)).toDF("doc_id", "text"))
    assert(out(1L)._4 == 1L && out(1L)._5 == 0L)
  }

  test("pages with fewer than minKeptLines surviving lines are dropped") {
    val page = "Only one good sentence here.\nbad line\nalso bad"
    val out = run(Seq((1L, page)).toDF("doc_id", "text"))
    assert(out(1L)._2 == 1L && out(1L)._5 == 0L)
    // ...but the line screen's rewrite is still emitted
    assert(out(1L)._6 == "Only one good sentence here.")
  }

  test("null text degrades to the empty page, not negative counts") {
    val docs = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(1L, null.asInstanceOf[String]),
        org.apache.spark.sql.Row(2L, cleanPage)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
    val out = run(docs)
    assert(out(1L) == (1L, 0L, 0L, 0L, 0L, ""))
    assert(out(2L)._5 == 1L)
  }

  test("dedupLines: repeated lines drop, first occurrence and order survive") {
    val page = "Nav menu here\nReal content sentence one.\nNav menu here\n" +
      "Real content sentence two.\nNav menu here\nReal content sentence one."
    val out = graft.queries.LineFilters.dedupLines(
        Seq((1L, page), (2L, "a\nb\nc"), (3L, "")).toDF("doc_id", "text"))
      .collect().map(r =>
        r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L) == (6L, 3L,
      "Nav menu here\nReal content sentence one.\nReal content sentence two."))
    assert(out(2L) == (3L, 0L, "a\nb\nc"))
    assert(out(3L) == (1L, 0L, ""))
  }

  test("dedupLines: blank separators and bullet markers are structural, never deduped") {
    val page = "First paragraph body here\n\nSecond paragraph body here\n\n" +
      "-\n-\nThird paragraph body here"
    val out = graft.queries.LineFilters.dedupLines(
        Seq((1L, page)).toDF("doc_id", "text"))
      .collect().map(r =>
        r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // both "" separators and both "-" bullets survive (trimmed length
    // under the threshold); only >= minLineChars lines dedup
    assert(out(1L) == (7L, 0L, page), out)
    val page2 = page + "\nFirst paragraph body here"
    val out2 = graft.queries.LineFilters.dedupLines(
        Seq((1L, page2)).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out2(1L) == page, "a repeated CONTENT line still dedupes")
  }

  test("the screen is partitioning-invariant") {
    val docs = Seq((1L, cleanPage), (2L, "x\ny\nz"), (3L, ""))
      .toDF("doc_id", "text")
    val one = Graft.c4Filters(docs).collect().toSeq
    val many = Graft.c4Filters(docs.repartition(7)).collect().toSeq
    assert(one == many)
  }

  test("pagesFrom: doc_id-ordered group concat with the planted trailing duplicate") {
    // 2 groups of 3: page text must be the members' texts in doc_id
    // order behind blank-line separators, with the FIRST member's text
    // repeated at the end — so each page plants exactly one duplicate
    // line and one duplicate paragraph for the line-operator oracles
    val docs = Seq(5L -> "cc cc", 3L -> "aa aa", 4L -> "bb bb",
      10L -> "xx xx", 11L -> "yy yy")
      .toDF("doc_id", "text")
    val out = graft.queries.LineFilters.pagesFrom(docs, groupSize = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "aa aa\n\nbb bb\n\ncc cc\n\naa aa", out)
    assert(out(3L) == "xx xx\n\nyy yy\n\nxx xx", out)
    // and dedupLines over the derived page reports exactly the plant
    val dup = graft.queries.LineFilters.dedupLines(
        graft.queries.LineFilters.pagesFrom(docs, groupSize = 3))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(dup == Map(1L -> 1L, 3L -> 1L), dup)
  }
}
