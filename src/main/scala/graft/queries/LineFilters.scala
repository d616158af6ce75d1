package graft.queries

import graft.{Q, Tables}
import graft.functions.TextFunctions.{sqlStopHits, sqlWords}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C18: C4-style line-structured page cleaning (Raffel et al. 2020,
  * "Exploring the Limits of Transfer Learning with a Unified
  * Text-to-Text Transformer", §2.2) — the classic line-level crawl
  * screen that complements the Gopher DOCUMENT gates (C16/C17): C4
  * filters WITHIN the page (keep only clean lines, then judge the page
  * by what survived) where Gopher only scores the page whole.
  *
  * Line rules (a line survives iff ALL hold):
  *   - ends in terminal punctuation (`.` `!` `?` `"`) — the paper's
  *     sentence heuristic (`requireTerminal`, default on)
  *   - carries at least `minWordsPerLine` whitespace words
  *   - contains none of `lineDropWords` as a whole lowercased word
  *     (the paper drops any line with the word "javascript")
  *
  * Page rules (the doc survives iff ALL hold):
  *   - at least `minKeptLines` lines survived the line screen (the
  *     paper's "at least 5 sentences" gate, counted here on surviving
  *     lines — each ends in terminal punctuation under the default
  *     config, so surviving lines are the sentence-bearing ones)
  *   - the lowercased page contains none of `pageDropPhrases` as a
  *     substring (the paper's "lorem ipsum" rule)
  *   - the page contains no curly brace (the paper's code screen)
  *
  * Output per doc: line counts, the page flags, the composed `kept`,
  * and `text_clean` — the surviving lines rejoined with `\n` (the
  * paper's actual artifact; emitted for every doc so a caller can
  * also use the line screen without the page gate). All flags are
  * 0/1 longs and every threshold is an integer comparison (the C16
  * rule) — no float anywhere.
  *
  * Scale shape: a pure shuffle-free codegen map stage over the scan
  * (split / filter / concat on each row in place), identical to the
  * C16/C17 gate shape — at 100 TB this is one pass with the
  * presentation sort as the only exchange. Composes with the gate
  * families: run C18 first (it REWRITES text), then score survivors.
  *
  * Correctness: the oracle row runs `requireTerminal = false`,
  * `minKeptLines = 1`, `lineDropWords = Seq("dup")` — the synthetic
  * corpus is single-line, punctuation-free `[a-z ]` text, so the
  * paper defaults would zero every row and verify nothing (the C16
  * precedent); under the oracle config the line word-count screen,
  * the line-drop-word screen, the page gate, and the rewrite all
  * have corpus action. The paper-default semantics (terminal
  * punctuation, javascript lines, lorem-ipsum/brace pages,
  * 5-sentence gate) are pinned by C4FilterSpec on planted multi-line
  * pages.
  */
object LineFilters {

  /** Terminal-punctuation line ending (C4 §2.2): `.`, `!`, `?`, or a
    * closing double quote, allowing trailing whitespace. */
  private val TerminalRe = "[.!?\"]" + TextAnalysis.GopherWs + "*$"

  private def lineWords(l: Column): Column =
    filter(split(lower(l), TextAnalysis.GopherWs + "+"), t => t =!= "")

  def c4Filters(
      docs: DataFrame,
      minWordsPerLine: Long = 3L,
      minKeptLines: Long = 5L,
      requireTerminal: Boolean = true,
      lineDropWords: Seq[String] = Seq("javascript"),
      pageDropPhrases: Seq[String] = Seq("lorem ipsum")): DataFrame =
    c4Flags(docs, minWordsPerLine, minKeptLines, requireTerminal,
      lineDropWords, pageDropPhrases).orderBy("doc_id")

  /** The sort-free core of [[c4Filters]] — a pure stateless map stage,
    * so it applies unchanged to a STREAMING frame
    * ([[graft.streaming.Streams.c4Stream]]; streaming plans cannot
    * sort). Same output contract minus the presentation order. */
  private[graft] def c4Flags(
      docs: DataFrame,
      minWordsPerLine: Long,
      minKeptLines: Long,
      requireTerminal: Boolean,
      lineDropWords: Seq[String],
      pageDropPhrases: Seq[String]): DataFrame = {
    require(minWordsPerLine >= 0 && minKeptLines >= 0,
      "thresholds must be non-negative")
    require(lineDropWords.forall(w => w.nonEmpty && w == w.toLowerCase) &&
      pageDropPhrases.forall(p => p.nonEmpty && p == p.toLowerCase),
      "drop words/phrases must be non-empty lowercase")
    def lineKept(l: Column): Column = {
      val ws = lineWords(l)
      val base = size(ws).cast("long") >= minWordsPerLine &&
        !lineDropWords.map(w => array_contains(ws, w)).foldLeft(lit(false))(_ || _)
      if (requireTerminal) base && rtrim(l).rlike(TerminalRe) else base
    }
    // null text degrades to the empty page (1 empty line, 0 kept) —
    // without the coalesce, size(split(null)) reports -1 under legacy
    // sizeOfNull and every count/flag goes negative (the D16 lesson)
    val lines = split(coalesce(col("text"), lit("")), "\n")
    val keptLines = filter(lines, lineKept _)
    docs
      .withColumn("n_lines", size(lines).cast("long"))
      .withColumn("kl", keptLines)
      .withColumn("n_kept_lines", size(col("kl")).cast("long"))
      .withColumn("has_page_phrase",
        when(pageDropPhrases.map(p => contains(lower(col("text")), lit(p)))
          .foldLeft(lit(false))(_ || _), 1L).otherwise(0L))
      .withColumn("has_brace",
        when(contains(col("text"), lit("{")) || contains(col("text"), lit("}")), 1L)
          .otherwise(0L))
      .withColumn("kept",
        when(col("n_kept_lines") >= minKeptLines &&
          col("has_page_phrase") === 0L && col("has_brace") === 0L, 1L)
          .otherwise(0L))
      .withColumn("text_clean", concat_ws("\n", col("kl")))
      .select("doc_id", "n_lines", "n_kept_lines", "has_page_phrase",
        "has_brace", "kept", "text_clean")
  }

  /** C20: INTRA-document line dedup — drop every line that repeats an
    * earlier line of the SAME page (C4 §2.2 "discarded all but one of
    * any three-sentence span occurring more than once" is the
    * span-level cousin; the per-line form is the standard
    * boilerplate/navigation scrub applied page-locally before any
    * corpus-wide pass). Exact raw-line equality, first occurrence
    * kept, order preserved; lines whose TRIMMED length is under
    * `minLineChars` (blank paragraph separators, bullet markers) are
    * exempt — they repeat by design, and deduping them would merge
    * the page into one paragraph blob:
    *
    *   (doc_id, n_lines, n_dup_lines, text_clean)
    *
    * Complements the corpus-wide rewriters: D10/D16 need a shuffle to
    * see cross-doc duplication; a page's own repeated chrome needs
    * none. Per-row cost is O(lines²) equality checks inside one
    * codegen HOF chain — pages are bounded (thousands of lines at
    * most), so this stays a pure shuffle-free map stage at any corpus
    * size (the C16/C18 shape; the presentation sort is the only
    * exchange). Null text degrades to the empty page (the C18 rule).
    *
    * The synthetic corpus is single-line, so the oracle row proves the
    * cross-engine rule math (first-occurrence indexing, rejoin) with
    * n_dup_lines pinned 0; the rewrite semantics on real multi-line
    * pages are pinned by C4FilterSpec's planted cases. */
  def dedupLines(docs: DataFrame, minLineChars: Int = 5): DataFrame =
    dedupLinesCore(docs, minLineChars).orderBy("doc_id")

  /** Sort-free core of [[dedupLines]] (the c4Flags convention) — a
    * pure map stage, composable mid-pipeline without an exchange
    * ([[Extract.extractClean]]). */
  private[queries] def dedupLinesCore(
      docs: DataFrame, minLineChars: Int = 5): DataFrame = {
    require(minLineChars >= 0, s"minLineChars must be >= 0, got $minLineChars")
    val lines = split(coalesce(col("text"), lit("")), "\n")
    // structural lines are EXEMPT: blank paragraph separators, bullet
    // markers, and other sub-threshold lines repeat by design — a
    // naive full dedup would strip every "\n\n" after the first and
    // merge the page into one paragraph blob (breaking downstream
    // paragraph-sensitive gates like C17)
    val keptIdx = filter(sequence(lit(1), size(lines)), i =>
      length(trim(element_at(lines, i))) < minLineChars ||
        array_position(lines, element_at(lines, i)) === i.cast("long"))
    docs
      .withColumn("n_lines", size(lines).cast("long"))
      .withColumn("kl", transform(keptIdx, i => element_at(lines, i)))
      .select(col("doc_id"), col("n_lines"),
        (col("n_lines") - size(col("kl"))).cast("long").as("n_dup_lines"),
        concat_ws("\n", col("kl")).as("text_clean"))
  }

  /** C20's oracle as a CTE chain + SELECT over any `tbl(doc_id, text)`
    * (no leading WITH) — shared by the documents row and the derived
    * multi-line pages row, so the two cannot drift. */
  private[queries] def sqlDedupLinesFrom(tbl: String): String =
    s"""dt AS (
        SELECT doc_id, string_split(coalesce(text, ''), chr(10)) AS lns
        FROM $tbl),
      dk AS (
        SELECT doc_id, CAST(len(lns) AS BIGINT) AS n_lines,
          list_transform(
            list_filter(range(1, len(lns) + 1),
              i -> length(trim(lns[i])) < 5 OR list_position(lns, lns[i]) = i),
            i -> lns[i]) AS kl
        FROM dt)
      SELECT doc_id, n_lines,
        CAST(n_lines - len(kl) AS BIGINT) AS n_dup_lines,
        coalesce(array_to_string(kl, chr(10)), '') AS text_clean
      FROM dk ORDER BY doc_id"""

  val qDedupLines: Q = Q(
    "q_dedup_lines",
    (s, d) => dedupLines(Tables.documents(s, d)),
    Some(s"WITH ${sqlDedupLinesFrom("documents")}"))

  /** The oracle row's line-drop word — "dup" rides in ~5% of synthetic
    * docs, so the line screen, page gate, and rewrite all have corpus
    * action ("javascript" never occurs and would verify nothing). */
  private val OracleDropWord = "dup"

  /** C18's oracle as a CTE chain + SELECT over any `tbl(doc_id, text)`
    * (no leading WITH), `minKeptLines` parameterized — shared by the
    * documents row and the derived multi-line pages row. */
  private[queries] def sqlC4FiltersFrom(tbl: String, minKeptLines: Int): String = {
    val ws = TextAnalysis.GopherWs
    s"""ct AS (
        SELECT doc_id, coalesce(text, '') AS text,
          string_split(coalesce(text, ''), chr(10)) AS lns FROM $tbl),
      ck AS (
        SELECT doc_id, text, CAST(len(lns) AS BIGINT) AS n_lines,
          list_filter(lns, l ->
            len(list_filter(string_split_regex(lower(l), '$ws+'), t -> t <> '')) >= 3
            AND NOT list_contains(
              list_filter(string_split_regex(lower(l), '$ws+'), t -> t <> ''),
              '$OracleDropWord')) AS kl
        FROM ct)
      SELECT doc_id, n_lines,
        CAST(len(kl) AS BIGINT) AS n_kept_lines,
        CAST(CASE WHEN contains(lower(text), 'lorem ipsum') THEN 1 ELSE 0 END AS BIGINT) AS has_page_phrase,
        CAST(CASE WHEN contains(text, '{') OR contains(text, '}') THEN 1 ELSE 0 END AS BIGINT) AS has_brace,
        CAST(CASE WHEN len(kl) >= $minKeptLines
          AND NOT contains(lower(text), 'lorem ipsum')
          AND NOT contains(text, '{') AND NOT contains(text, '}')
          THEN 1 ELSE 0 END AS BIGINT) AS kept,
        coalesce(array_to_string(kl, chr(10)), '') AS text_clean
      FROM ck ORDER BY doc_id"""
  }

  val qC4Filters: Q = Q(
    "q_c4_filters",
    (s, d) => c4Filters(Tables.documents(s, d),
      minWordsPerLine = 3L, minKeptLines = 1L, requireTerminal = false,
      lineDropWords = Seq(OracleDropWord)),
    Some(s"WITH ${sqlC4FiltersFrom("documents", 1)}"))

  /** Deterministic multi-line PAGES derived in-query from the
    * single-line synthetic corpus, so the LINE-structured operators
    * get corpus-scale hash evidence on input that actually has lines
    * (their documents-table rows pin the indexing math, but every
    * n_dup_lines there is 0 and every page is its own single line):
    * each page = `groupSize` consecutive docs' texts joined with
    * BLANK-LINE separators (so both line and paragraph structure
    * exist), with the group's first text repeated at the end — a
    * planted intra-page duplicate line/paragraph per page. Both
    * engines build the frame by the same doc_id-ordered group-concat,
    * so the derivation itself is part of what the hash checks. */
  private[graft] def pagesFrom(docs: DataFrame, groupSize: Int = 10): DataFrame = {
    val sorted = transform(
      array_sort(collect_list(struct(col("doc_id").as("i"),
        coalesce(col("text"), lit("")).as("t")))),
      s => s("t"))
    docs.groupBy(expr(s"doc_id div $groupSize").as("doc_id"))
      .agg(concat_ws("\n\n", concat(sorted, slice(sorted, 1, 1))).as("text"))
  }

  /** [[pagesFrom]] as DuckDB CTEs `pg, pages(doc_id, text)`. */
  private[queries] def sqlPagesCtes(tbl: String, groupSize: Int = 10): String =
    s"""pg AS (SELECT doc_id // $groupSize AS doc_id,
        list(coalesce(text, '') ORDER BY doc_id) AS ts
      FROM $tbl GROUP BY 1),
      pages AS (SELECT doc_id,
        array_to_string(ts || [ts[1]], chr(10) || chr(10)) AS text
      FROM pg)"""

  /** C18 over the derived pages: 11 candidate text lines per page
    * (10 members + the planted repeat) behind blank separators; the
    * 10-kept-lines gate turns on exactly when the line screen eats
    * ≥2 of them, so n_kept_lines AND kept both vary at corpus scale. */
  val qC4FiltersPages: Q = Q(
    "q_c4_filters_pages",
    (s, d) => c4Filters(pagesFrom(Tables.documents(s, d)),
      minWordsPerLine = 3L, minKeptLines = 10L, requireTerminal = false,
      lineDropWords = Seq(OracleDropWord)),
    Some(s"WITH ${sqlPagesCtes("documents")}, ${sqlC4FiltersFrom("pages", 10)}"))

  /** C20 over the derived pages: every page carries one planted
    * duplicate line, and the blank separators exercise the
    * structural-line exemption corpus-wide (deduping them would merge
    * each page into one paragraph blob). */
  val qDedupLinesPages: Q = Q(
    "q_dedup_lines_pages",
    (s, d) => dedupLines(pagesFrom(Tables.documents(s, d))),
    Some(s"WITH ${sqlPagesCtes("documents")}, ${sqlDedupLinesFrom("pages")}"))

  /** C17 over the derived pages: line/paragraph dup fractions with
    * real multi-line, multi-paragraph input — dup_lines and dup_paras
    * are nonzero on every page (the planted repeat), so the r1/r2
    * fraction gates and the blank-line/paragraph trimming all carry
    * corpus-scale hash evidence (their documents-table row pins them
    * at the single-line degenerate point). */
  val qGopherRepPages: Q = Q(
    "q_gopher_rep_pages",
    (s, d) => TextAnalysis.gopherRepetition(pagesFrom(Tables.documents(s, d))),
    Some(s"WITH ${sqlPagesCtes("documents")}, " +
      s"${TextAnalysis.sqlGopherRepCtes("pages")} " +
      TextAnalysis.sqlGopherRepSelect))

  /** C21's oracle row runs over the derived multi-line pages frame
    * (pagesFrom) — grouped pages mix doc vocabularies, so
    * majority election, minority drops, and the rewrite all have
    * corpus action — and votes over CORPUS-VOCABULARY token families
    * instead of the real-language default lists (the C16
    * parameterization precedent: the synthetic corpus has no actual
    * multilingual text, so every real-language election would elect
    * en and leave the es/de/fr branches unverified; under the token
    * families every branch wins pages at sf0.01). */
  private[queries] val OracleLangStops: Seq[(String, Seq[String])] = Seq(
    "struct" -> Seq("table", "row", "column", "line"),
    "flow" -> Seq("stream", "batch", "window", "merge"),
    "calc" -> Seq("agg", "group", "order", "sort"),
    "store" -> Seq("key", "value", "hash", "vector"))

  /** [[langSplitParas]]'s oracle SQL over any `tbl(doc_id, text)` for
    * a given vote table — generated from the SAME list the Spark side
    * consumes, so the two cannot drift. */
  private[queries] def sqlLangSplitParasFrom(
      tbl: String, stopsByLang: Seq[(String, Seq[String])]): String = {
    def hits(sw: Seq[String]) = sqlStopHits(sqlWords("para"), sw)
    val labeled = stopsByLang.map { case (l, sw) => (l, hits(sw)) }
    val predCase = {
      val zero = s"WHEN ${labeled.map(x => s"(${x._2})").mkString(" + ")} = 0 THEN 'und'"
      val arms = labeled.zipWithIndex.map { case ((l, h), i) =>
        val rest = labeled.drop(i + 1)
        if (rest.isEmpty) s"ELSE '$l'"
        else s"WHEN ${rest.map(r => s"($h) >= (${r._2})").mkString(" AND ")} THEN '$l'"
      }
      s"CASE $zero ${arms.mkString(" ")} END"
    }
    val nCols = stopsByLang.map { case (l, _) =>
      s"CAST(count(*) FILTER (pl = '$l') AS BIGINT) AS n_$l" }.mkString(",\n          ")
    val pageCase = {
      val zero = s"WHEN ${stopsByLang.map(p => s"n_${p._1}").mkString(" + ")} = 0 THEN 'und'"
      val arms = stopsByLang.zipWithIndex.map { case ((l, _), i) =>
        val rest = stopsByLang.drop(i + 1)
        if (rest.isEmpty) s"ELSE '$l'"
        else s"WHEN ${rest.map(r => s"n_$l >= n_${r._1}").mkString(" AND ")} THEN '$l'"
      }
      s"CASE $zero ${arms.mkString(" ")} END"
    }
    val nSel = stopsByLang.map(p => s"g.n_${p._1}").mkString(", ")
    s"""lp AS (SELECT doc_id,
          string_split(coalesce(text, ''), chr(10) || chr(10)) AS paras
        FROM $tbl),
      pp AS (SELECT doc_id,
          CAST(generate_subscripts(paras, 1) AS BIGINT) AS i,
          unnest(paras) AS para
        FROM lp),
      pv AS (SELECT doc_id, i, para, $predCase AS pl FROM pp),
      pa AS (SELECT doc_id,
          CAST(count(*) AS BIGINT) AS n_paras,
          $nCols,
          CAST(count(*) FILTER (pl = 'und') AS BIGINT) AS n_und
        FROM pv GROUP BY doc_id),
      pmaj AS (SELECT *, $pageCase AS page_lang FROM pa),
      kp AS (SELECT v.doc_id,
          CAST(count(*) AS BIGINT) AS n_kept,
          array_to_string(list(v.para ORDER BY v.i), chr(10) || chr(10)) AS text_clean
        FROM pv v JOIN pmaj g ON v.doc_id = g.doc_id AND v.pl = g.page_lang
        GROUP BY v.doc_id)
      SELECT g.doc_id, g.n_paras, $nSel, g.n_und,
        g.page_lang,
        CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
        coalesce(k.text_clean, '') AS text_clean
      FROM pmaj g LEFT JOIN kp k ON g.doc_id = k.doc_id
      ORDER BY g.doc_id"""
  }

  val qLangParas: Q = Q(
    "q_lang_paras",
    (s, d) => TextAnalysis.langSplitParas(
      pagesFrom(Tables.documents(s, d)), OracleLangStops),
    Some(s"WITH ${sqlPagesCtes("documents")},\n      " +
      sqlLangSplitParasFrom("pages", OracleLangStops)))

  val all: Seq[Q] =
    Seq(qC4Filters, qDedupLines, qC4FiltersPages, qDedupLinesPages,
      qGopherRepPages, qLangParas)
}
