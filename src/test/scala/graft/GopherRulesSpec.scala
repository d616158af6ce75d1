package graft

/** C16 [[graft.queries.TextAnalysis.gopherRules]] on planted rule
  * violations — each rule trips exactly where intended. */
class GopherRulesSpec extends SparkSpec {
  import spark.implicits._

  private val goodText =
    "the cat and the dog have been with all of that good crew " +
      "for many long years and they would sing songs all day"

  private def flags(text: String): Map[String, Long] = {
    val df = Graft.gopherRules(Seq((1L, text)).toDF("doc_id", "text"),
      minWords = 10L)
    val row = df.collect().head
    df.columns.zipWithIndex.map { case (c, i) => c -> row.getLong(i) }.toMap
  }

  test("clean text passes every rule") {
    val f = flags(goodText)
    assert(f("kept") == 1L, f)
  }

  test("too-short text fails r1 only") {
    val f = flags("the dog and that")
    assert(f("r1_words") == 0L && f("kept") == 0L && f("r7_stop") == 1L, f)
  }

  test("symbol soup fails r3") {
    val f = flags(goodText + " " + Seq.fill(10)("###").mkString(" "))
    assert(f("r3_sym") == 0L && f("kept") == 0L, f)
  }

  test("bulleted list fails r4") {
    val lines = Seq.fill(10)("- the item of that list have with be").mkString("\n")
    val f = flags(lines)
    assert(f("r4_bullet") == 0L && f("kept") == 0L, f)
  }

  test("ellipsis-heavy lines fail r5") {
    val lines = Seq.fill(10)("the thing of that trailing have be ...").mkString("\n")
    val f = flags(lines)
    assert(f("r5_ell") == 0L && f("kept") == 0L, f)
  }

  test("numeric soup fails r6") {
    val f = flags(goodText + " " + (1 to 40).map(_.toString).mkString(" "))
    assert(f("r6_alpha") == 0L && f("kept") == 0L, f)
  }

  test("stopword-free text fails r7") {
    val f = flags(Seq.fill(20)("zork blap quux flim").mkString(" "))
    assert(f("r7_stop") == 0L && f("kept") == 0L, f)
  }

  test("vertical tab separates words like any other whitespace") {
    // the explicit [ \t\n\f\r\x0B] class must split on \x0B — RE2's \s
    // wouldn't, and the oracle uses the same class, so this pins the
    // shared whitespace definition on the Spark side
    val f = flags(goodText.replace(' ', '\u000B'))
    assert(f("n_words") == flags(goodText)("n_words"), f)
  }

  test("mean word length out of range fails r2") {
    val f = flags(Seq.fill(30)("a I") .mkString(" ") + " the of")
    assert(f("r2_wordlen") == 0L && f("kept") == 0L, f)
  }
}
