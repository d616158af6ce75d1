package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C25 — markup/boilerplate TEXT EXTRACTION: the missing FIRST stage of
  * a real crawl pipeline. Every line/paragraph gate in the C family
  * (C18 line screen, C20 line dedup, C21 paragraph language split)
  * assumes extracted line-structured plain text — but real corpora
  * arrive as HTML/WARC payloads. `extractText` turns a markup page into
  * that line frame:
  *
  *   1. script / style / comment blocks removed WITH their bodies
  *      (their text is code, not prose — and their brackets/braces
  *      would false-trip the C18 code screen);
  *   2. BLOCK-element boundaries become paragraph breaks (`p`,
  *      headings, `div`, `ul`/`ol`, `table`, `blockquote`, `title`,
  *      `html`/`head`/`body`, `section`/`article`/`header`/`footer`/
  *      `nav`, `pre`, `form`) and line-item boundaries become line
  *      breaks (`br`, `li`, `tr`, `td`, `th`, `dt`, `dd`);
  *   3. every remaining tag (inline: `a`, `b`, `span`, …) strips to
  *      nothing — inline markup separates no words;
  *   4. a core entity set decodes (named + numeric:
  *      lt/gt/quot/apos/nbsp/amp and their `&#NN;` forms), `&amp;`
  *      LAST so double-escaped entities single-decode (`&amp;lt;` →
  *      the literal text `&lt;`); decoding runs AFTER tag stripping,
  *      so a decoded `&lt;script&gt;` can never re-parse as markup;
  *   5. SOURCE whitespace is insignificant (the HTML rule): every run
  *      collapses to one space, and all line/paragraph structure in
  *      the output comes from the tag mapping — `\n\n` between
  *      paragraphs, `\n` between lines, no leading/trailing space.
  *      (Consequence: plain text with no tags flattens to one line —
  *      this operator is for markup input; already-extracted text
  *      should skip it.)
  *
  * Everything is deterministic string surgery — regexp_replace /
  * replace chains, no DOM library — so the DuckDB oracle replays the
  * identical chain from the SAME pattern constants (the C18 precedent)
  * and the row is hash-exact. DOCTYPE / `<!` declarations, CDATA
  * blocks (body included — it is markup payload, not prose), and
  * `<?...?>` processing instructions are removed like comments. No
  * DOM also means documented edges: an unterminated `<script>` (or
  * `<?`) keeps its tail text (tags inside still strip), and a `>`
  * inside a quoted tag attribute ends the tag early.
  *
  * Scale shape: ONE shuffle-free codegen map stage over the scan (the
  * C16/C18 gate shape) — at 100 TB this is a single pass; the
  * presentation sort is the only exchange. Ingest order downstream
  * (see [[extractClean]]): extract → C21 language split (paragraphs
  * exist here) → C20 line dedup (blank separators survive via the
  * structural exemption) → C18 line screen + page gate.
  */
object Extract {

  /** Internal structure placeholders — distinct from every whitespace
    * class so the whitespace collapse can't eat tag-derived structure.
    * Input occurrences are scrubbed first (step 0): real text never
    * carries control chars, and a crawl byte that did would otherwise
    * forge paragraph breaks. */
  private val LinePh = "\u0001"
  private val ParaPh = "\u0002"

  // Pattern constants shared VERBATIM with the oracle SQL (interpolated
  // into both the Spark regexp_replace calls and the DuckDB fragment)
  // — the two engines compile the same source text, so the chain
  // cannot drift. Java regex and RE2 agree on every construct used:
  // inline (?i)/(?s) flags, \b word boundaries, lazy .*?, \xNN
  // escapes, {n,} quantifiers, character classes.
  private[queries] val ScriptRe = """(?is)<script\b[^>]*>.*?</script\s*>"""
  private[queries] val StyleRe = """(?is)<style\b[^>]*>.*?</style\s*>"""
  private[queries] val CommentRe = """(?s)<!--.*?-->"""
  // declarations are markup, not prose: CDATA blocks whole (their body
  // may contain '>'), then <!DOCTYPE ...> / other <! declarations,
  // then <?xml ...?> processing instructions — all after comment
  // removal (a comment may contain any of them)
  private[queries] val CdataRe = """(?s)<!\[CDATA\[.*?\]\]>"""
  private[queries] val DeclRe = """(?s)<![^>]*>"""
  private[queries] val PiRe = """(?s)<\?.*?\?>"""
  // longest-first alternation (header before head, pre before p)
  private val ParaTags = "blockquote|section|article|header|head|html|" +
    "body|title|table|pre|p|h[1-6]|ul|ol|div|form|nav|footer"
  // NB: this is the one s-INTERPOLATED pattern — the s interpolator
  // processes escapes even in triple quotes, so the word boundary must
  // be written \\b here (the plain-literal patterns below keep \b)
  private[queries] val ParaTagRe = s"""(?i)</?($ParaTags)\\b[^>]*>"""
  private[queries] val LineTagRe = """(?i)<br\b[^>]*>|</?(li|tr|td|th|dt|dd)\b[^>]*>"""
  // a tag must open with a letter (after optional /): "a < b" in prose
  // is not markup and survives
  private[queries] val AnyTagRe = """(?s)</?[a-zA-Z][^>]*>"""
  private[queries] val HadMarkupRe =
    """(?s)</?[a-zA-Z][^>]*>|<!--|<!\[CDATA\[|(?i:<!doctype)|<\?[a-zA-Z]"""
  private[queries] val WsRe = """\s+"""
  // placeholder-adjacent space trims (two passes; no group refs —
  // Java wants $1 where RE2 wants \1, so patterns avoid them)
  private[queries] val LineTrimRe = """ ?\x01 ?"""
  private[queries] val ParaTrimRe = """ ?\x02 ?"""
  // any placeholder run CONTAINING a paragraph marker is a paragraph
  // break; a pure line-marker run is one line break
  private[queries] val ParaRunRe = """\x01*\x02[\x01\x02]*"""
  private[queries] val LineRunRe = """\x01{2,}"""
  private[queries] val EdgeTrimRe = """^\s+|\s+$"""

  /** Core entity table (named + numeric). `&amp;`/`&#38;` decode LAST:
    * none of the other entity spellings is a substring of its own
    * escaped form, so one pass single-decodes `&amp;lt;` to `&lt;`. */
  private[queries] val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&#60;" -> "<",
    "&gt;" -> ">", "&#62;" -> ">",
    "&quot;" -> "\"", "&#34;" -> "\"",
    "&apos;" -> "'", "&#39;" -> "'",
    "&nbsp;" -> " ", "&#160;" -> " ",
    "&amp;" -> "&", "&#38;" -> "&")

  /** The extraction chain as a single Column — one codegen map stage. */
  private[queries] def extractTextCol(text: Column): Column = {
    val c0 = replace(replace(coalesce(text, lit("")),
      lit(LinePh), lit("")), lit(ParaPh), lit(""))
    val noScript = regexp_replace(c0, ScriptRe, " ")
    val noStyle = regexp_replace(noScript, StyleRe, " ")
    val noComment = regexp_replace(noStyle, CommentRe, " ")
    val noCdata = regexp_replace(noComment, CdataRe, " ")
    val noDecl = regexp_replace(noCdata, DeclRe, " ")
    val noPi = regexp_replace(noDecl, PiRe, " ")
    val para = regexp_replace(noPi, ParaTagRe, ParaPh)
    val line = regexp_replace(para, LineTagRe, LinePh)
    val noTags = regexp_replace(line, AnyTagRe, "")
    val ent = Entities.foldLeft(noTags) {
      case (c, (k, v)) => replace(c, lit(k), lit(v))
    }
    val ws = regexp_replace(ent, WsRe, " ")
    val t1 = regexp_replace(ws, LineTrimRe, LinePh)
    val t2 = regexp_replace(t1, ParaTrimRe, ParaPh)
    val r1 = regexp_replace(t2, ParaRunRe, ParaPh)
    val r2 = regexp_replace(r1, LineRunRe, LinePh)
    val nl = replace(replace(r2, lit(ParaPh), lit("\n\n")),
      lit(LinePh), lit("\n"))
    regexp_replace(nl, EdgeTrimRe, "")
  }

  /** Sort-free core of [[extractText]] (the C18 c4Flags convention):
    * applies unchanged to a streaming frame
    * ([[graft.streaming.Streams.extractStream]]). */
  private[graft] def extractTextFlags(docs: DataFrame): DataFrame =
    docs
      .withColumn("had_markup",
        when(coalesce(col("text"), lit("")).rlike(HadMarkupRe), 1L)
          .otherwise(0L))
      .withColumn("text_clean", extractTextCol(col("text")))
      .withColumn("n_lines",
        size(split(col("text_clean"), "\n")).cast("long"))
      .withColumn("n_paras",
        size(split(col("text_clean"), "\n\n")).cast("long"))
      .select("doc_id", "had_markup", "n_lines", "n_paras", "text_clean")

  /** Public API: markup → extracted line/paragraph frame over any
    * (doc_id, text) DataFrame. Output per doc: `had_markup` (0/1 —
    * did the page carry any tag/comment), `n_lines` / `n_paras` of
    * the extracted text, and `text_clean` (the line frame the C18/
    * C20/C21 gates consume). */
  def extractText(docs: DataFrame): DataFrame =
    extractTextFlags(docs).orderBy("doc_id")

  // ---------------------------------------------------------------
  // derived pages-WITH-MARKUP frame (the round-10 derived-pages
  // technique): the synthetic corpus is plain single-line text, so the
  // oracle rows wrap groups of real corpus texts in a deterministic
  // HTML skeleton — script+style+comment bodies, block/inline/entity
  // structure, a planted duplicate <li> line and a repeated <h1> —
  // giving extraction corpus-scale hash action. Both engines build
  // the SAME page string from the same template (part of the hash).
  // ---------------------------------------------------------------

  private[queries] val PageGroup = 5

  /** Page skeleton: literal markup fragments interleaved with 1-based
    * group-member indices. The single source for the Spark builder AND
    * the SQL builder. */
  private val PageTemplate: Seq[Either[String, Int]] = Seq(
    Left("<!DOCTYPE html>\n<html>\n <head>\n  <title>"), Right(1),
    Left("</title>\n  <style>body { color: #333; }</style>\n" +
      "  <script type=\"text/javascript\">if (1 < 2) { x = \"a&b\"; }" +
      "</script>\n </head>\n <body>\n  <h1>"), Right(1),
    Left("</h1>\n  <!-- nav boilerplate -->\n  <p><b>"), Right(2),
    Left("</b> &amp; co. &lt;end&gt;</p>\n  <ul>\n   <li>"), Right(3),
    Left("</li>\n   <li>"), Right(3),
    Left("</li>\n  </ul>\n  <div>"), Right(4),
    Left("<br>"), Right(5),
    Left("&nbsp;&#39;q&#39;</div>\n </body>\n</html>"))

  /** Groups of [[PageGroup]] consecutive docs wrapped in the HTML
    * skeleton (doc_id-ordered members; short edge groups fill with
    * empty strings). */
  private[graft] def htmlPagesFrom(docs: DataFrame): DataFrame = {
    val sorted = transform(
      array_sort(collect_list(struct(col("doc_id").as("i"),
        coalesce(col("text"), lit("")).as("t")))),
      s => s("t"))
    val page = concat(PageTemplate.map {
      case Left(s) => lit(s)
      case Right(i) => coalesce(try_element_at(col("ts"), lit(i)), lit(""))
    }: _*)
    docs.groupBy(expr(s"doc_id div $PageGroup").as("doc_id"))
      .agg(sorted.as("ts"))
      .select(col("doc_id"), page.as("text"))
  }

  private def sqlQ(s: String): String = "'" + s.replace("'", "''") + "'"

  /** [[htmlPagesFrom]] as DuckDB CTEs ending in `hpages(doc_id, text)`. */
  private[queries] def sqlHtmlPagesCtes(tbl: String): String = {
    val page = PageTemplate.map {
      case Left(s) => sqlQ(s)
      case Right(i) => s"coalesce(ts[$i], '')"
    }.mkString(" || ")
    s"""hp AS (SELECT doc_id // $PageGroup AS doc_id,
        list(coalesce(text, '') ORDER BY doc_id) AS ts
      FROM $tbl GROUP BY 1),
      hpages AS (SELECT doc_id, $page AS text FROM hp)"""
  }

  /** The extraction chain + counts as DuckDB CTEs over any
    * `tbl(doc_id, text)`, ending in `exo(doc_id, had_markup, n_lines,
    * n_paras, text_clean)` — lateral column aliases chain the steps
    * inside one SELECT; every pattern is the SAME Scala constant the
    * Spark side compiles. */
  private[queries] def sqlExtractCtes(tbl: String): String = {
    val entChain = Entities.foldLeft("e7") {
      case (acc, (k, v)) => s"replace($acc, ${sqlQ(k)}, ${sqlQ(v)})"
    }
    s"""exs AS (SELECT doc_id, coalesce(text, '') AS t0,
        replace(replace(coalesce(text, ''), chr(1), ''), chr(2), '') AS e0,
        regexp_replace(e0, ${sqlQ(ScriptRe)}, ' ', 'g') AS e1,
        regexp_replace(e1, ${sqlQ(StyleRe)}, ' ', 'g') AS e2,
        regexp_replace(e2, ${sqlQ(CommentRe)}, ' ', 'g') AS e3,
        regexp_replace(e3, ${sqlQ(CdataRe)}, ' ', 'g') AS e4a,
        regexp_replace(e4a, ${sqlQ(DeclRe)}, ' ', 'g') AS e4b,
        regexp_replace(e4b, ${sqlQ(PiRe)}, ' ', 'g') AS e4c,
        regexp_replace(e4c, ${sqlQ(ParaTagRe)}, chr(2), 'g') AS e5,
        regexp_replace(e5, ${sqlQ(LineTagRe)}, chr(1), 'g') AS e6,
        regexp_replace(e6, ${sqlQ(AnyTagRe)}, '', 'g') AS e7,
        regexp_replace($entChain, ${sqlQ(WsRe)}, ' ', 'g') AS e8,
        regexp_replace(e8, ${sqlQ(LineTrimRe)}, chr(1), 'g') AS e9,
        regexp_replace(e9, ${sqlQ(ParaTrimRe)}, chr(2), 'g') AS e10,
        regexp_replace(e10, ${sqlQ(ParaRunRe)}, chr(2), 'g') AS e11,
        regexp_replace(e11, ${sqlQ(LineRunRe)}, chr(1), 'g') AS e12,
        replace(replace(e12, chr(2), chr(10) || chr(10)), chr(1), chr(10)) AS e13,
        regexp_replace(e13, ${sqlQ(EdgeTrimRe)}, '', 'g') AS tc
      FROM $tbl),
      exo AS (SELECT doc_id,
        CAST(CASE WHEN regexp_matches(t0, ${sqlQ(HadMarkupRe)})
          THEN 1 ELSE 0 END AS BIGINT) AS had_markup,
        CAST(len(string_split(tc, chr(10))) AS BIGINT) AS n_lines,
        CAST(len(string_split(tc, chr(10) || chr(10))) AS BIGINT) AS n_paras,
        tc AS text_clean
      FROM exs)"""
  }

  /** C25's oracle row: extraction over the derived markup pages. */
  val qExtractText: Q = Q(
    "q_extract_text",
    (s, d) => extractText(htmlPagesFrom(Tables.documents(s, d))),
    Some(s"""WITH ${sqlHtmlPagesCtes("documents")},
      ${sqlExtractCtes("hpages")}
      SELECT doc_id, had_markup, n_lines, n_paras, text_clean
      FROM exo ORDER BY doc_id"""))

  // ---------------------------------------------------------------
  // the composed ingest pipeline: extract → C21 → C20 → C18
  // ---------------------------------------------------------------

  /** The documented crawl-ingest order as ONE declarative plan
    * (`Graft.extractClean`): markup extraction → C21 per-paragraph
    * language split (paragraph structure exists ONLY right after
    * extraction — the C18 screen later removes blank lines) → C20
    * intra-page line dedup (blank separators survive via the
    * structural exemption, so paragraphs reach the next stage intact)
    * → C18 line screen + page gate (the final arbiter; its
    * `text_clean` is the corpus the document-level gates then score).
    * Output = C18's per-page columns over every page. All four stages
    * are shuffle-free map stages chained in one plan — at 100 TB this
    * is STILL one pass over the scan; the presentation sort is the
    * only exchange.
    *
    * Stage params are caller-visible because real corpora need the
    * real knobs; defaults are the library defaults of each stage. */
  def extractClean(
      docs: DataFrame,
      stopsByLang: Seq[(String, Seq[String])] = TextAnalysis.DefaultLangStops,
      minWordsPerLine: Long = 3L,
      minKeptLines: Long = 5L,
      requireTerminal: Boolean = true,
      lineDropWords: Seq[String] = Seq("javascript"),
      pageDropPhrases: Seq[String] = Seq("lorem ipsum")): DataFrame = {
    val ex = extractTextFlags(docs)
      .select(col("doc_id"), col("text_clean").as("text"))
    val lang = TextAnalysis.langSplitParasCore(ex, stopsByLang)
      .select(col("doc_id"), col("text_clean").as("text"))
    val dd = LineFilters.dedupLinesCore(lang)
      .select(col("doc_id"), col("text_clean").as("text"))
    LineFilters.c4Flags(dd, minWordsPerLine, minKeptLines, requireTerminal,
      lineDropWords, pageDropPhrases).orderBy("doc_id")
  }

  /** The composed row, oracle-config gates (the C16/C18
    * parameterization: punctuation-free corpus → requireTerminal off,
    * corpus-bearing drop word "dup", vote table =
    * [[LineFilters.OracleLangStops]]). Its oracle nests each stage's
    * EXISTING fragment builder as a `stage AS (WITH …)` subchain —
    * extraction, C21, C20, C18 all replayed from the same SQL the
    * standalone rows hash against, so the composition cannot drift
    * from its stages (the D17/D18 technique). */
  val qExtractClean: Q = Q(
    "q_extract_clean",
    (s, d) => extractClean(htmlPagesFrom(Tables.documents(s, d)),
      stopsByLang = LineFilters.OracleLangStops,
      minWordsPerLine = 3L, minKeptLines = 3L, requireTerminal = false,
      lineDropWords = Seq("dup")),
    Some(s"""WITH ${sqlHtmlPagesCtes("documents")},
      ${sqlExtractCtes("hpages")},
      exdocs AS (SELECT doc_id, text_clean AS text FROM exo),
      lang AS (WITH ${LineFilters.sqlLangSplitParasFrom("exdocs", LineFilters.OracleLangStops)}),
      langdocs AS (SELECT doc_id, text_clean AS text FROM lang),
      dd AS (WITH ${LineFilters.sqlDedupLinesFrom("langdocs")}),
      dddocs AS (SELECT doc_id, text_clean AS text FROM dd),
      ${LineFilters.sqlC4FiltersFrom("dddocs", 3)}"""))

  val all: Seq[Q] = Seq(qExtractText, qExtractClean)
}
