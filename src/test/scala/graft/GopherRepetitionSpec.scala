package graft

/** C17 [[graft.queries.TextAnalysis.gopherRepetition]] on planted rule
  * violations — each repetition rule trips exactly where intended, and
  * the sorted-fold dominant-gram statistic matches a naive count. */
class GopherRepetitionSpec extends SparkSpec {
  import spark.implicits._

  // every token distinct (i-suffixed), so no 2-gram dominates and no
  // line repeats — whitespace tokens span newlines, so even repeated
  // per-line TEMPLATE words would create dominant cross-line 2-grams
  private val cleanText =
    (1 to 12).map(i => s"alpha$i bravo$i charlie$i delta$i echo$i")
      .mkString("\n")

  private def flags(text: String): Map[String, Long] = {
    val df = Graft.gopherRepetition(Seq((1L, text)).toDF("doc_id", "text"))
    val row = df.collect().head
    df.columns.zipWithIndex.map { case (c, i) => c -> row.getLong(i) }.toMap
  }

  test("distinct-line prose passes every rule") {
    val f = flags(cleanText)
    assert(f("kept") == 1L, f)
    assert(f("dup_lines") == 0L && f("dup_paras") == 0L, f)
  }

  test("repeated lines fail r1_dupline") {
    // 6 extra copies of line one -> dup fraction 6/18 = 33% > 30%
    val t = (cleanText.linesIterator.toSeq ++
      Seq.fill(6)(cleanText.linesIterator.next())).mkString("\n")
    val f = flags(t)
    assert(f("r1_dupline") == 0L && f("kept") == 0L, f)
  }

  test("repeated paragraphs fail r2_duppara") {
    val para = "this paragraph repeats itself across the document body"
    val t = (Seq("one unique opening paragraph stands alone here") ++
      Seq.fill(2)(para)).mkString("\n\n")
    val f = flags(t) // 1 of 3 paragraphs is a repeat -> 33% > 30%
    assert(f("r2_duppara") == 0L && f("kept") == 0L, f)
  }

  test("a dominant 2-gram fails r3_top2 (and its coverage is exact)") {
    // "alpha beta" x 6 among 4 other tokens: top2 = 6 * 9 chars = 54
    val t = Seq.fill(6)("alpha beta").mkString(" ") + " just four more words"
    val f = flags(t)
    assert(f("top2_chars") == 54L, f)
    assert(f("r3_top2") == 0L && f("kept") == 0L, f)
  }

  test("fold matches naive dominant-gram count on mixed text") {
    // naive check computed by hand over 2-grams of "a b a b c a b":
    // "a b" occurs 3x (chars 2) = 6; "b a" 1x; "b c"/"c a" 1x each
    val f = flags("a b a b c a b")
    assert(f("top2_chars") == 6L, f)
    // 3-grams: "a b a" 1, "b a b" 1, "a b c" 1, "b c a" 1, "c a b" 1 -> max 3
    assert(f("top3_chars") == 3L, f)
  }

  test("native kernel equals the HOF sort+fold spec on varied docs") {
    // the production column is the hashed native kernel
    // (NativeExpressions.TopGramCover); the HOF formulation stays as
    // its semantic spec — drive both over docs with ties, unicode,
    // self-overlap, and short tails
    import org.apache.spark.sql.functions._
    val docs = Seq(
      "a b a b c a b", "x x x x x", "solo", "", "tie ab tie cd tie ab",
      "über älter über älter über", "p q r s t u v w p q r s",
      "one two one two one two one two").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val toks = filter(split(col("text"), "\\s+"), t => t =!= "")
    for (n <- 2 to 4) {
      val both = docs.select(
        graft.functions.NativeExpressions.topGramCover(toks, n).as("native"),
        graft.queries.TextAnalysis.topGramCoverHof(toks, n).as("hof")).collect()
      both.foreach(r => assert(r.getLong(0) == r.getLong(1), s"n=$n ${r}"))
    }
  }

  test("native kernel pins null array elements as empty tokens") {
    // the two ArrayData representations disagree on nulls (skip vs
    // empty); the kernel pins empty so results can't depend on which
    // side of a shuffle a row evaluated on
    import org.apache.spark.sql.functions._
    val c = spark.range(1).select(
      graft.functions.NativeExpressions.topGramCover(
        array(lit("a"), lit(null).cast("string"), lit("a"),
          lit(null).cast("string")), 2).as("c"))
      .head().getLong(0)
    // grams: ("a","")x2 and ("","a") -> best = 2 occurrences x 1 char
    assert(c == 2L, c)
  }

  test("whitespace-only and tiny docs are vacuously kept") {
    val f = flags("   \n  \n ")
    assert(f("n_lines") == 0L && f("sum_chars") == 0L && f("kept") == 1L, f)
    val g = flags("one")
    assert(g("top2_chars") == 0L && g("kept") == 1L, g)
  }

  test("gate is partitioning-invariant") {
    val docs = (0L until 30L).map(i =>
      (i, if (i % 3 == 0) Seq.fill(8)("dup dup").mkString("\n")
          else s"doc $i carries its own fresh words here"))
      .toDF("doc_id", "text")
    val a = Graft.gopherRepetition(docs.repartition(1)).collect().toSeq
    val b = Graft.gopherRepetition(docs.repartition(7)).collect().toSeq
    assert(a == b && a.nonEmpty)
    graft.ops.Release.sweep(spark)
  }
}
