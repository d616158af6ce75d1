package graft

/** C25 [[graft.queries.Extract.extractText]] on planted markup — the
  * oracle rows prove the cross-engine chain over the derived pages
  * frame; the extraction SEMANTICS (script/style/comment removal,
  * block vs line vs inline tag mapping, entity decode incl. the
  * double-escape and decode-after-strip rules, whitespace collapse)
  * are pinned here case by case. */
class ExtractSpec extends SparkSpec {
  import spark.implicits._

  private def extract(pages: (Long, String)*): Map[Long, (Long, Long, Long, String)] =
    Graft.extractText(pages.toSeq.toDF("doc_id", "text")).collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap

  private def clean(id: Long, page: String): String =
    extract(id -> page)(id)._4

  test("script, style, and comment bodies vanish with their brackets") {
    val page = "<html><head><style>p { color: red; }</style>" +
      "<script>if (a < b) { alert(\"x&y\"); }</script></head>" +
      "<body><p>real text here</p><!-- <p>commented out</p> --></body></html>"
    val out = extract(1L -> page)(1L)
    assert(out._4 == "real text here")
    assert(out._1 == 1L) // had_markup
    // no brace, angle, or entity residue from the removed bodies
    assert(!out._4.contains("{") && !out._4.contains("alert") &&
      !out._4.contains("commented"))
  }

  test("block tags break paragraphs, line tags break lines, inline tags strip") {
    val page = "<h1>Title Words</h1><p>first <b>bold</b> para</p>" +
      "<ul><li>item one</li><li>item two</li></ul>" +
      "<div>left<br>right</div>"
    assert(clean(1L, page) ==
      "Title Words\n\nfirst bold para\n\nitem one\nitem two\n\nleft\nright")
  }

  test("tag attributes, self-closing forms, and case are handled") {
    val page = "<P CLASS=\"x\">a</P><BR/><DIV id='y'>b</DIV>"
    assert(clean(1L, page) == "a\n\nb")
  }

  test("core entities decode, amp last so double-escapes single-decode") {
    val page = "<p>a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39;" +
      " nb&nbsp;sp and literal &amp;lt; stays</p>"
    assert(clean(1L, page) ==
      "a & b <tag> \"q\" 's' nb sp and literal &lt; stays")
  }

  test("decoded entities never re-parse as markup (decode after strip)") {
    val page = "<p>&lt;script&gt;evil()&lt;/script&gt;</p>"
    assert(clean(1L, page) == "<script>evil()</script>")
  }

  test("source whitespace is insignificant: newlines and indentation collapse") {
    val page = "<p>\n   spread\n   over\n   lines\n  </p>\n\n  <p>next</p>"
    assert(clean(1L, page) == "spread over lines\n\nnext")
  }

  test("plain text without tags flattens to one line (documented contract)") {
    val out = extract(1L -> "line one\nline two")(1L)
    assert(out == ((0L, 1L, 1L, "line one line two")))
  }

  test("a 'less-than' in prose is not a tag") {
    assert(clean(1L, "<p>we know 1 < 2 and x <= y</p>") ==
      "we know 1 < 2 and x <= y")
  }

  test("DOCTYPE, CDATA, and processing instructions are markup, not prose") {
    val page = "<?xml version=\"1.0\"?><!DOCTYPE html>" +
      "<html><body><p>real</p><![CDATA[ raw > payload ]]></body></html>"
    val out = extract(1L -> page)(1L)
    assert(out._4 == "real")
    assert(out._1 == 1L) // had_markup sees the declarations too
    assert(extract(2L -> "<!DOCTYPE html>")(2L)._1 == 1L)
  }

  test("mixed placeholder runs resolve to the strongest break") {
    // </li></ul><div> = line+para+para markers in one run -> ONE
    // paragraph break, never a stack of blank lines
    val page = "<ul><li>a</li></ul><div>b</div>"
    assert(clean(1L, page) == "a\n\nb")
  }

  test("null and empty text degrade to the empty page") {
    val df = Seq((1L, null.asInstanceOf[String]), (2L, ""))
      .toDF("doc_id", "text")
    val out = Graft.extractText(df).collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getString(4)))).toMap
    assert(out(1L) == ((0L, "")) && out(2L) == ((0L, "")))
  }

  test("input control chars are scrubbed, not structure-forging") {
    val page = "<p>a\u0001b\u0002c</p>"
    assert(clean(1L, page) == "abc")
  }

  test("counts report the extracted structure") {
    val out = extract(1L -> "<p>one</p><p>two<br>three</p>")(1L)
    // "one\n\ntwo\nthree": 4 lines (incl the blank), 2 paragraphs
    assert(out == ((1L, 4L, 2L, "one\n\ntwo\nthree")))
  }

  test("extractClean chains the four stages in ingest order") {
    // page: one good paragraph (terminal sentences, stopword-bearing),
    // one repeated boilerplate line, one javascript line
    val page = "<p>The cat and the dog sat here.</p>" +
      "<p>The nav menu line.</p><p>The nav menu line.</p>" +
      "<p>Enable the javascript to view this.</p>" +
      "<p>And they would sing songs all day.</p>"
    val out = Graft.extractClean(
      Seq((1L, page)).toDF("doc_id", "text"), minKeptLines = 2L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(5), r.getString(6)))).head._2
    // the dup "Nav menu line." dedups to one, the javascript line drops,
    // the two real sentences survive -> 3 kept lines >= 2 -> page kept
    assert(out._1 == 1L)
    assert(out._2 == "The cat and the dog sat here.\nThe nav menu line.\n" +
      "And they would sing songs all day.")
  }
}
