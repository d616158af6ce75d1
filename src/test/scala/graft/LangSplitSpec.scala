package graft

import graft.queries.TextAnalysis

/** C21 [[TextAnalysis.langSplitParas]] on planted multilingual pages:
  * the per-paragraph vote, majority election, precedence tie-breaks,
  * and the rewrite — under the real-language DEFAULT lists (the oracle
  * row swaps in corpus token families; the paper posture is pinned
  * here). */
class LangSplitSpec extends SparkSpec {
  import spark.implicits._

  private val en1 = "the cat of the house and a dog"
  private val en2 = "a bird is in the garden of stone"
  private val fr1 = "le chat et les oiseaux du jardin au matin"
  private val es1 = "el gato y la casa de un perro que canta"
  private val und1 = "zzz qqq xxx"

  test("majority election keeps only the page language's paragraphs, order preserved") {
    val page = Seq(en1, fr1, en2, und1).mkString("\n\n")
    val out = TextAnalysis.langSplitParas(Seq((1L, page)).toDF("doc_id", "text"))
      .collect().head
    assert(out.getLong(1) == 4L && out.getString(7) == "en", out)   // n_paras, page_lang
    assert(out.getLong(2) == 2L && out.getLong(5) == 1L && out.getLong(6) == 1L,
      s"n_en/n_fr/n_und: $out")
    assert(out.getLong(8) == 2L, out)                               // n_kept
    assert(out.getString(9) == s"$en1\n\n$en2", "kept paragraphs rejoined in order")
  }

  test("count ties break by list precedence; all-und pages keep everything") {
    // one en paragraph, one es paragraph: tie at 1-1 -> en (earlier label)
    val tie = TextAnalysis.langSplitParas(
      Seq((1L, s"$en1\n\n$es1")).toDF("doc_id", "text")).collect().head
    assert(tie.getString(7) == "en" && tie.getLong(8) == 1L, tie)
    val und = TextAnalysis.langSplitParas(
      Seq((2L, s"$und1\n\n$und1")).toDF("doc_id", "text")).collect().head
    assert(und.getString(7) == "und" && und.getLong(8) == 2L,
      s"all-und pages elect und and keep every paragraph: $und")
  }

  test("custom vote tables and null text degrade like the other line screens") {
    val out = TextAnalysis.langSplitParas(
      Seq((1L, "aa bb\n\ncc dd"), (2L, null.asInstanceOf[String]))
        .toDF("doc_id", "text"),
      stopsByLang = Seq("x" -> Seq("aa"), "y" -> Seq("cc")))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getString(5) == "x", out(1L))  // tie 1-1 -> x precedence
    assert(out(2L).getLong(1) == 1L && out(2L).getString(5) == "und",
      s"null text is the empty single-paragraph page: ${out(2L)}")
    intercept[IllegalArgumentException](TextAnalysis.langSplitParas(
      Seq((1L, "a")).toDF("doc_id", "text"), Seq("und" -> Seq("a"))))
  }
}
