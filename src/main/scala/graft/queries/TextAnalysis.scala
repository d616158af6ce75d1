package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

/** Text-analysis suite over the documents table (SURVEY.md §2 C1–C5):
  * the per-document scoring/fingerprinting passes of an LLM training-data
  * pipeline. All are single-scan, shuffle-free per-doc computations (the
  * only shuffle is the presentation orderBy; at 100 TB these run as pure
  * map stages over the corpus and write partitioned output).
  *
  * Determinism: every score is integer arithmetic plus at most ONE double
  * division at the end (single IEEE op == correctly rounded in any
  * engine); no transcendental functions (libm results differ across
  * engines), no double accumulation.
  */
object TextAnalysis {

  /** Memo of [[collocations]]' unigram/bigram count frames (see
    * [[graft.ops.PlanCache]]; released by [[graft.ops.Release]]). */
  private[this] val countCache = new graft.ops.PlanCache(capacity = 4)

  /** Memo of [[qualityDeciles]]' scored frame — dedicated so decile
    * traffic can't evict the collocation count memos (and vice versa):
    * the threshold branch and the assignment branch both read it, so
    * the corpus is scanned and tokenized exactly once per call. */
  private[this] val decCache = new graft.ops.PlanCache(capacity = 2)

  private val stopEn = Seq("the", "a", "of", "and", "to", "in", "is")
  private val stopEs = Seq("el", "la", "de", "que", "y", "en", "un")
  private val stopDe = Seq("der", "die", "das", "und", "ist", "von", "mit")
  private val stopFr = Seq("le", "les", "et", "des", "une", "du", "au")

  /** C1: token counting — whitespace tokens, letter-run word tokens, and a
    * BPE-ish segmentation (letter runs | digit runs | single symbols). */
  /** Public API: token stats per doc over any (doc_id, text) frame. */
  def tokenStats(docs: DataFrame): DataFrame =
      docs
        .select(
          col("doc_id"),
          size(filter(split(col("text"), "\\s+"), t => t =!= "")).cast("long").as("n_ws_tokens"),
          size(words(col("text"))).cast("long").as("n_word_tokens"),
          size(regexp_extract_all(lower(col("text")), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))
            .cast("long").as("n_bpe_tokens"),
          length(col("text")).cast("long").as("n_chars"))
        .orderBy("doc_id")

  val qTokens: Q = Q(
    "q_tokens",
    (s, d) => tokenStats(Tables.documents(s, d)),
    Some(s"""SELECT doc_id,
      len(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS n_ws_tokens,
      len(list_filter(${sqlWords("text")}, t -> t <> '')) AS n_word_tokens,
      len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS n_bpe_tokens,
      CAST(length(text) AS BIGINT) AS n_chars
      FROM documents ORDER BY doc_id"""))

  /** C2: language ID — stopword-hit voting with a fixed tie-break order,
    * reported as a confusion matrix against the labeled `lang`. */
  /** Public API: stopword-vote language ID confusion matrix. */
  def languageId(docs: DataFrame): DataFrame = {
      val toks = words(col("text"))
      val en = stopHits(toks, stopEn)
      val es = stopHits(toks, stopEs)
      val de = stopHits(toks, stopDe)
      val fr = stopHits(toks, stopFr)
      docs
        .select(col("doc_id"), col("lang"),
          when(en + es + de + fr === 0, "und")
            .when(en >= es && en >= de && en >= fr, "en")
            .when(es >= de && es >= fr, "es")
            .when(de >= fr, "de")
            .otherwise("fr").as("pred_lang"))
        .groupBy(col("lang"), col("pred_lang"))
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "pred_lang")
  }

  val qLangId: Q = Q(
    "q_lang_id",
    (s, d) => languageId(Tables.documents(s, d)),
    Some {
      val toks = sqlWords("text")
      val (en, es, de, fr) = (sqlStopHits(toks, stopEn), sqlStopHits(toks, stopEs),
        sqlStopHits(toks, stopDe), sqlStopHits(toks, stopFr))
      s"""SELECT lang, pred_lang, count(*) AS n FROM (
        SELECT lang,
          CASE WHEN ($en) + ($es) + ($de) + ($fr) = 0 THEN 'und'
               WHEN ($en) >= ($es) AND ($en) >= ($de) AND ($en) >= ($fr) THEN 'en'
               WHEN ($es) >= ($de) AND ($es) >= ($fr) THEN 'es'
               WHEN ($de) >= ($fr) THEN 'de'
               ELSE 'fr' END AS pred_lang
        FROM documents) t
      GROUP BY lang, pred_lang ORDER BY lang, pred_lang"""
    })

  /** C21: per-PARAGRAPH language split (the CCNet shape, Wenzek '20 —
    * language identified per paragraph, the document keeping only its
    * majority language's paragraphs) — the screen the DOC-level C2
    * vote can't express: a page pasted together from
    * different-language fragments keeps its dominant language's
    * paragraphs, rewritten in place, instead of being scored (and
    * possibly dropped) whole. Per page: paragraphs = blank-line
    * splits; each paragraph votes by C2's stopword rule and fixed
    * precedence (en ≥ es ≥ de ≥ fr, no-signal → und); `page_lang` =
    * the paragraph-vote majority under the same precedence (all-und →
    * und, and then every paragraph is kept); `text_clean` = the
    * page_lang paragraphs rejoined with blank lines, original order.
    *
    * Scale shape: integer HOF counting inside ONE shuffle-free codegen
    * map stage over the scan (the C16/C18 gate shape) — the
    * presentation sort is the only exchange at any corpus size.
    * Output: (doc_id, n_paras, n_en, n_es, n_de, n_fr, n_und,
    * page_lang, n_kept, text_clean). */
  /** The language vote table: label -> stopword list, in PRECEDENCE
    * order (earlier labels win count ties — C2's en >= es >= de >= fr
    * chain generalized). The API default is the real-language posture;
    * the oracle row swaps in corpus-vocabulary token families (the
    * C16 parameterization precedent) because the synthetic corpus has
    * no actual multilingual text and every real-language election
    * would degenerate to en/und, leaving three branches unverified. */
  val DefaultLangStops: Seq[(String, Seq[String])] =
    Seq("en" -> stopEn, "es" -> stopEs, "de" -> stopDe, "fr" -> stopFr)

  def langSplitParas(
      docs: DataFrame,
      stopsByLang: Seq[(String, Seq[String])] = DefaultLangStops): DataFrame =
    langSplitParasCore(docs, stopsByLang).orderBy("doc_id")

  /** Sort-free core of [[langSplitParas]] (the c4Flags convention) —
    * a pure map stage, composable mid-pipeline without an exchange
    * ([[Extract.extractClean]]). */
  private[queries] def langSplitParasCore(
      docs: DataFrame,
      stopsByLang: Seq[(String, Seq[String])]): DataFrame = {
    require(stopsByLang.nonEmpty &&
      stopsByLang.map(_._1).toSet.size == stopsByLang.size &&
      !stopsByLang.exists(_._1 == "und"),
      "stopsByLang labels must be distinct and not 'und'")
    def pred(p: Column): Column = {
      val t = words(p)
      val hits = stopsByLang.map { case (l, sw) => (l, stopHits(t, sw)) }
      val chain = hits.zipWithIndex.foldLeft(
        when(hits.map(_._2).reduce(_ + _) === 0, "und")) {
        case (acc, ((l, h), i)) =>
          val cond = hits.drop(i + 1).map(_._2)
            .foldLeft(lit(true))((c, r) => c && h >= r)
          acc.when(cond, l)
      }
      chain.otherwise(stopsByLang.last._1)
    }
    def nOf(l: String): Column =
      size(filter(col("preds"), p => p === l)).cast("long")
    val counted = docs
      .withColumn("paras", split(coalesce(col("text"), lit("")), "\n\n"))
      .withColumn("preds", transform(col("paras"), pred _))
    val withCounts = stopsByLang.foldLeft(
        counted.withColumn("n_und", nOf("und"))) {
      case (df, (l, _)) => df.withColumn(s"n_$l", nOf(l))
    }
    val pageLang = stopsByLang.zipWithIndex.foldLeft(
      when(stopsByLang.map(p => col(s"n_${p._1}")).reduce(_ + _) === 0L, "und")) {
      case (acc, ((l, _), i)) =>
        val cond = stopsByLang.drop(i + 1)
          .map(p => col(s"n_${p._1}"))
          .foldLeft(lit(true))((c, r) => c && col(s"n_$l") >= r)
        acc.when(cond, l)
    }.otherwise(stopsByLang.last._1)
    withCounts
      .withColumn("page_lang", pageLang)
      .withColumn("ki", filter(sequence(lit(1), size(col("paras"))),
        i => element_at(col("preds"), i) === col("page_lang")))
      .select(Seq(col("doc_id"), size(col("paras")).cast("long").as("n_paras")) ++
        stopsByLang.map(p => col(s"n_${p._1}")) ++ Seq(col("n_und"),
        col("page_lang"), size(col("ki")).cast("long").as("n_kept"),
        concat_ws("\n\n",
          transform(col("ki"), i => element_at(col("paras"), i))).as("text_clean")): _*)
  }


  /** The quality score as a bare column — (stop_hits·100 + n_words) /
    * (n_chars + 1), the same signal [[qualityScores]] reports — for
    * callers that need it inside another plan (the streaming curation
    * gate, [[graft.streaming.Streams.curateStream]]). */
  def qualityScoreCol(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (stopHits(words(text), stopEn) * 100L + size(words(text)).cast("long"))
      .cast("double") / (length(text).cast("long") + 1L)

  /** C3: quality scoring — length/stopword/word-shape signals, integer
    * counts with single-division ratios. */
  /** Public API: quality signals per doc. */
  def qualityScores(docs: DataFrame): DataFrame = {
      val toks = words(col("text"))
      docs
        .select(
          col("doc_id"),
          length(col("text")).cast("long").as("n_chars"),
          size(toks).cast("long").as("n_words"),
          stopHits(toks, stopEn).as("stop_hits"),
          size(regexp_extract_all(col("text"), lit("[^a-zA-Z0-9\\s]"), lit(0)))
            .cast("long").as("n_punct"),
          qualityScoreCol(col("text")).as("quality_score"))
        .withColumn("avg_word_len",
          (col("n_chars") - col("n_words") + 1).cast("double") / greatest(col("n_words"), lit(1L)))
        .withColumn("stop_ratio",
          col("stop_hits").cast("double") / greatest(col("n_words"), lit(1L)))
        .withColumn("punct_ratio",
          col("n_punct").cast("double") / greatest(col("n_chars"), lit(1L)))
        .orderBy("doc_id")
  }

  /** Oracle-side quality score as a CTE `q_scores (doc_id,
    * quality_score)` over `tbl` — the fragment [[Curation]]'s composed
    * oracle gates on. */
  private[queries] def sqlQualityCte(tbl: String): String = {
    val toks = sqlWords("text")
    val en = sqlStopHits(toks, stopEn)
    s"""q_scores AS (
      SELECT doc_id,
        CAST(($en) * 100 + len(list_filter($toks, t -> t <> '')) AS DOUBLE) /
          (CAST(length(text) AS BIGINT) + 1) AS quality_score
      FROM $tbl)"""
  }

  val qQuality: Q = Q(
    "q_quality",
    (s, d) => qualityScores(Tables.documents(s, d)),
    Some {
      val toks = sqlWords("text")
      val en = sqlStopHits(toks, stopEn)
      s"""SELECT doc_id, n_chars, n_words, stop_hits, n_punct,
        CAST(n_chars - n_words + 1 AS DOUBLE) / greatest(n_words, 1) AS avg_word_len,
        CAST(stop_hits AS DOUBLE) / greatest(n_words, 1) AS stop_ratio,
        CAST(n_punct AS DOUBLE) / greatest(n_chars, 1) AS punct_ratio,
        CAST(stop_hits * 100 + n_words AS DOUBLE) / (n_chars + 1) AS quality_score
      FROM (SELECT doc_id,
        CAST(length(text) AS BIGINT) AS n_chars,
        len(list_filter($toks, t -> t <> '')) AS n_words,
        ($en) AS stop_hits,
        len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS n_punct
        FROM documents) t ORDER BY doc_id"""
    })

  /** C15: quality stratification — assign each doc its decile (1 = worst
    * tenth … 10 = best) under the C3 quality score, the threshold-free
    * form of "keep the top 30%": a pipeline filters `decile >= 8`
    * instead of guessing an absolute score cutoff that drifts with the
    * corpus.
    *
    * Scale shape — the bounded-histogram threshold pass (NOT
    * percentile_disc): the score is quantized onto a FIXED-size integer
    * grid (2^14 units per 1.0 of score, computed as one exact integer
    * `num·2^14 div den` from the same integers the score divides — no
    * float in the threshold domain at all), so the threshold input is a
    * map-side-combinable count histogram over a key space bounded by
    * the score RANGE (≤ ~101·2^14 ≈ 1.7M buckets whatever the corpus
    * size — score ≤ (100·n_words + n_words)/(n_chars+1) ≲ 101/2). A
    * `percentile_disc` over the raw near-unique-per-doc double instead
    * buffers an O(corpus-distinct-values) value→count map into ONE
    * final task — the single plan in this repo that died at 100 TB
    * (round-6 verdict) and the reason for this shape. The cumulative
    * pass runs over histogram ROWS only (single-partition window over
    * ≤1.7M bounded rows — a spillable sort, not unbounded hash state),
    * thresholds t_i are percentile_disc's own value-picking rule on the
    * quantized domain (smallest unit u with 10·cum(u) ≥ i·n, all-integer
    * — no ceil, no doubles), and assignment is 9 integer comparisons
    * per doc against the broadcast 1-row threshold frame. The corpus is
    * scanned ONCE: the scored frame is memo-persisted and both the
    * histogram branch and the paint branch read the memo.
    *
    * Semantics: deciles of the QUANTIZED score — docs whose scores
    * collide within 2^-14 share a bucket and therefore a decile, and
    * ties at a threshold fall into the LOWER decile (strict >
    * comparisons), so decile populations are only approximately equal
    * under heavy ties. The deterministic, engine-portable choice; the
    * oracle reproduces the full integer pipeline bit-for-bit. The
    * reported `quality_score` column stays the raw C3 double. */
  /** The C15 quality-score numerator/denominator as pure columns over
    * a `text` column — shared by [[qualityDeciles]] and the stateless
    * stream-side paint ([[CorpusMap.assignFrozen]], G22), so the score
    * cannot drift between the fitted and frozen paths. */
  private[graft] def qNumDenCols: (Column, Column) = {
    val num = stopHits(words(col("text")), stopEn) * 100L +
      size(words(col("text"))).cast("long")
    val den = length(col("text")).cast("long") + 1L
    (num, den)
  }

  /** The memoized per-doc scored frame (doc_id, quality_score,
    * q_units) behind C15 — shared by [[qualityDeciles]] and
    * [[decileCuts]] so both read the same persisted pass. */
  private[this] def scoredFrame(docs: DataFrame): DataFrame = {
    val (num, den) = qNumDenCols
    decCache.memo(docs
      .select(col("doc_id"),
        (num.cast("double") / den).as("quality_score"),
        num.as("q_num"), den.as("q_den"))
      .withColumn("q_units", expr("q_num * 16384L div q_den"))
      .drop("q_num", "q_den"))
  }

  /** The bounded-histogram decile thresholds of [[qualityDeciles]] as
    * a #thresholds-row frame (t1..t9). */
  private[this] def decileThresholds(scored: DataFrame): DataFrame = {
    val hist = scored.filter(col("q_units").isNotNull)
      .groupBy("q_units").agg(count(lit(1)).as("cnt"))
    import org.apache.spark.sql.expressions.Window
    // single-partition windows are safe HERE only because the input is
    // the bounded histogram, never the corpus
    val wCum = Window.orderBy("q_units")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy("q_units")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = hist.select(col("q_units"),
      sum(col("cnt")).over(wCum).as("cum"),
      sum(col("cnt")).over(wAll).as("n_tot"))
    cum.agg(
      min(when(col("cum") * 10L >= col("n_tot") * 1L, col("q_units"))).as("t1"),
      (2 to 9).map(i =>
        min(when(col("cum") * 10L >= col("n_tot") * i.toLong, col("q_units")))
          .as(s"t$i")): _*)
  }

  def qualityDeciles(docs: DataFrame): DataFrame = {
    val scored = scoredFrame(docs)
    val ths = decileThresholds(scored)
    scored.crossJoin(broadcast(ths))
      .select(col("doc_id"), col("quality_score"),
        (lit(1L) + (1 to 9).map(i =>
          when(col("q_units") > col(s"t$i"), 1L).otherwise(0L))
          .reduce(_ + _)).as("decile"))
      .orderBy("doc_id")
  }

  /** The FROZEN C15 state: this corpus's 9 decile cut points (q_units
    * thresholds) collected as model literals — the bounded state a
    * stateless decile paint carries onto arriving docs (the G22
    * corpus-map stream; the D15c stash-literal pattern).
    * Eager: one histogram pass at call time. */
  private[graft] def decileCuts(docs: DataFrame): Seq[Long] = {
    val row = decileThresholds(scoredFrame(docs)).head()
    require(!row.isNullAt(0),
      "decileCuts: no scored docs — cannot freeze thresholds")
    (0 until 9).map(row.getLong)
  }

  /** Oracle-side decile pipeline as CTEs ending in
    * `deciles (doc_id, quality_score, decile)` over `tbl` — shared by
    * the C15 row and H13's curriculum composition (the D17/D18
    * composed-oracle technique: stages reuse the standalone fragment,
    * so they cannot drift). */
  private[queries] def sqlDecileCtes(tbl: String): String = {
    val toks = sqlWords("text")
    val en = sqlStopHits(toks, stopEn)
    val cases = (1 to 9)
      .map(i => s"(CASE WHEN q_units > t$i THEN 1 ELSE 0 END)")
      .mkString(" + ")
    val ths = (1 to 9)
      .map(i => s"min(CASE WHEN cum * 10 >= n_tot * $i THEN q_units END) AS t$i")
      .mkString(", ")
    s"""base AS (
        SELECT doc_id,
          ($en) * 100 + len(list_filter($toks, t -> t <> '')) AS q_num,
          CAST(length(text) AS BIGINT) + 1 AS q_den
        FROM $tbl),
      q AS (
        SELECT doc_id, CAST(q_num AS DOUBLE) / q_den AS quality_score,
          (q_num * 16384) // q_den AS q_units
        FROM base),
      hist AS (SELECT q_units, count(*) AS cnt FROM q
        WHERE q_units IS NOT NULL GROUP BY 1),
      cum AS (SELECT q_units,
        sum(cnt) OVER (ORDER BY q_units
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        sum(cnt) OVER () AS n_tot FROM hist),
      ths AS (SELECT $ths FROM cum),
      deciles AS (
        SELECT doc_id, quality_score,
          CAST(1 + $cases AS BIGINT) AS decile
        FROM q CROSS JOIN ths)"""
  }

  val qQualityDeciles: Q = Q(
    "q_quality_deciles",
    (s, d) => qualityDeciles(Tables.documents(s, d)),
    Some(s"""WITH ${sqlDecileCtes("documents")}
      SELECT doc_id, quality_score, decile
      FROM deciles
      ORDER BY doc_id"""))

  /** The Gopher rule-filter stopword set (Rae et al. 2021, MassiveWeb:
    * "contain at least two of the following stop words"). */
  private[graft] val GopherStops =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** C16: Gopher/MassiveWeb rule-based quality gate (Rae et al. 2021,
    * "Scaling Language Models: … Gopher", table A1) — the standard
    * heuristic pre-filter of a crawl pipeline, reported as per-rule
    * flags so a curator can audit WHICH rule fires, plus the composed
    * `kept`:
    *
    *   r1_words   word count in [minWords, maxWords]
    *   r2_wordlen mean word length in [3, 10] chars
    *   r3_sym     symbol-to-word ratio (#, …, ...) ≤ 0.1
    *   r4_bullet  ≤ 10% of lines start with a bullet (•, *, -)
    *   r5_ell     ≤ 30% of lines end with an ellipsis
    *   r6_alpha   ≥ 80% of words contain an alphabetic char
    *   r7_stop    ≥ 2 distinct Gopher stopwords present
    *
    * "Words" here are WHITESPACE tokens (the paper's definition — r6
    * is vacuous on letter-run tokens). Every ratio test is an integer
    * CROSS-MULTIPLIED comparison (n_sym·10 ≤ n_words, not a double
    * compare), so the gate is exact and engine-portable with no float
    * anywhere.
    *
    * Scale shape: one shuffle-free codegen'd map stage over the scan
    * (the C3/C11 shape) — at 100 TB this runs as a pure map with the
    * presentation sort as the only exchange. */
  def gopherRules(
      docs: DataFrame,
      minWords: Long = 50L,
      maxWords: Long = 100000L,
      stops: Seq[String] = GopherStops): DataFrame =
    gopherFlags(docs, minWords, maxWords, stops).orderBy("doc_id")

  /** The sort-free core of [[gopherRules]] — a pure stateless map
    * stage, so it applies unchanged to a STREAMING frame
    * ([[graft.streaming.Streams.gopherStream]]; streaming plans cannot
    * sort). Same output contract minus the presentation order. */
  /** Explicit whitespace character class shared by the Spark split and
    * the DuckDB oracle's `string_split_regex` — both Java regex and
    * RE2 read it identically, unlike `\s` (Java includes `\x0B`, RE2
    * doesn't). */
  private[graft] val GopherWs = "[ \\t\\n\\f\\r\\x0B]"

  private[graft] def gopherFlags(
      docs: DataFrame,
      minWords: Long,
      maxWords: Long,
      stops: Seq[String]): DataFrame =
    gopherFlagsRetain(docs, minWords, maxWords, stops).select(
      Seq("doc_id", "n_words", "r1_words", "r2_wordlen", "r3_sym",
        "r4_bullet", "r5_ell", "r6_alpha", "r7_stop", "kept")
        .map(col): _*)

  /** [[gopherFlags]] with the INPUT columns retained (docs + counts +
    * flags + kept) — the form a streaming composition filters in place
    * ([[graft.streaming.Streams]]'s keyed ingest; a streaming plan
    * cannot flag-join two derived streams). Same expressions, built
    * once, so the two forms cannot drift. */
  private[graft] def gopherFlagsRetain(
      docs: DataFrame,
      minWords: Long,
      maxWords: Long,
      stops: Seq[String]): DataFrame = {
    require(minWords >= 0 && minWords <= maxWords,
      s"need 0 <= minWords <= maxWords, got [$minWords, $maxWords]")
    require(stops.nonEmpty && stops.toSet.size == stops.size,
      "stops must be non-empty and distinct")
    // ONE whitespace definition for both engines: Java's \s includes
    // vertical tab \x0B, RE2's (DuckDB) does not, so a doc containing
    // \x0B would tokenize differently cross-engine under bare \s+. The
    // explicit class below is what the SQL oracle uses verbatim.
    val toks = filter(split(col("text"), GopherWs + "+"), t => t =!= "")
    val lines = split(col("text"), "\n")
    val counted = docs
      .withColumn("n_words", size(toks).cast("long"))
      .withColumn("sum_chars",
        aggregate(transform(toks, t => length(t).cast("long")), lit(0L),
          (a, x) => a + x))
      .withColumn("n_alpha",
        size(filter(toks, t => t.rlike("[a-zA-Z]"))).cast("long"))
      .withColumn("n_stops",
        stops.map(s =>
            when(array_contains(transform(toks, t => lower(t)), s), 1L).otherwise(0L))
          .reduce(_ + _))
      .withColumn("n_lines", size(lines).cast("long"))
      .withColumn("n_bullet",
        size(filter(lines, l => trim(l).rlike("^[•*-]"))).cast("long"))
      .withColumn("n_ell",
        size(filter(lines, l => l.rlike("(\\.\\.\\.|…)" + GopherWs + "*$")))
          .cast("long"))
      .withColumn("n_sym",
        size(regexp_extract_all(col("text"), lit("#|…|\\.\\.\\."), lit(0)))
          .cast("long"))
    val flags = Seq(
      "r1_words" -> (col("n_words") >= minWords && col("n_words") <= maxWords),
      "r2_wordlen" -> (col("sum_chars") >= col("n_words") * 3L &&
        col("sum_chars") <= col("n_words") * 10L),
      "r3_sym" -> (col("n_sym") * 10L <= col("n_words")),
      "r4_bullet" -> (col("n_bullet") * 10L <= col("n_lines")),
      "r5_ell" -> (col("n_ell") * 10L <= col("n_lines") * 3L),
      "r6_alpha" -> (col("n_alpha") * 10L >= col("n_words") * 8L),
      "r7_stop" -> (col("n_stops") >= 2L))
    flags.foldLeft(counted) { case (df, (n, c)) =>
        df.withColumn(n, when(c, 1L).otherwise(0L))
      }
      .withColumn("kept", flags.map(_._2).reduce(_ && _).cast("long"))
  }

  /** The corpus-bearing stop set the C16/C18 oracle rows gate on (the
    * paper's Gopher stop set shares only {the} with the synthetic
    * vocabulary and would pin r7 to 0 everywhere). */
  private[queries] val CorpusStops: Seq[String] = stopEn

  /** C16's counts CTE body over `tbl` (any table or parenthesized
    * subquery) — shared by the flags oracle below and the D17
    * composed-pipeline oracle, so the two can never drift. */
  private[queries] def sqlGopherCountsCte(tbl: String): String = {
    val toks = s"list_filter(string_split_regex(text, '${GopherWs}+'), t -> t <> '')"
    val stops = CorpusStops
      .map(s => s"CASE WHEN list_contains(lt, '$s') THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""gc AS (
        SELECT doc_id,
          CAST(len(toks) AS BIGINT) AS n_words,
          CAST(coalesce(list_sum(list_transform(toks, t -> length(t))), 0) AS BIGINT) AS sum_chars,
          CAST(len(list_filter(toks, t -> regexp_matches(t, '[a-zA-Z]'))) AS BIGINT) AS n_alpha,
          CAST($stops AS BIGINT) AS n_stops,
          CAST(len(lns) AS BIGINT) AS n_lines,
          CAST(len(list_filter(lns, l -> regexp_matches(trim(l), '^[•*-]'))) AS BIGINT) AS n_bullet,
          CAST(len(list_filter(lns, l -> regexp_matches(l, '(\\.\\.\\.|…)${GopherWs}*$$'))) AS BIGINT) AS n_ell,
          CAST(len(regexp_extract_all(text, '#|…|\\.\\.\\.')) AS BIGINT) AS n_sym
        FROM (SELECT doc_id, text, ($toks) AS toks,
            list_transform(($toks), t -> lower(t)) AS lt,
            string_split(text, chr(10)) AS lns
          FROM $tbl) t)"""
  }

  /** C16's composed kept condition over the [[sqlGopherCountsCte]]
    * columns (minWords = 10, the oracle-row setting). */
  private[queries] val sqlGopherKeptCond: String =
    """n_words >= 10 AND n_words <= 100000
          AND sum_chars >= n_words * 3 AND sum_chars <= n_words * 10
          AND n_sym * 10 <= n_words
          AND n_bullet * 10 <= n_lines
          AND n_ell * 10 <= n_lines * 3
          AND n_alpha * 10 >= n_words * 8
          AND n_stops >= 2"""

  /** Oracle row: minWords lowered to 10 (the synthetic docs run ~30
    * words) and the stop set swapped to the corpus-bearing C3 English
    * set — the paper's Gopher stop set shares only {the} with the
    * synthetic vocabulary, which would pin r7 (and `kept`) to 0 for
    * every row and verify nothing. Paper defaults stay the API
    * defaults. */
  val qGopherRules: Q = Q(
    "q_gopher_rules",
    (s, d) =>
      gopherRules(Tables.documents(s, d), minWords = 10L, stops = CorpusStops),
    Some {
      s"""WITH ${sqlGopherCountsCte("documents")}
      SELECT doc_id, n_words,
        CAST(CASE WHEN n_words >= 10 AND n_words <= 100000 THEN 1 ELSE 0 END AS BIGINT) AS r1_words,
        CAST(CASE WHEN sum_chars >= n_words * 3 AND sum_chars <= n_words * 10 THEN 1 ELSE 0 END AS BIGINT) AS r2_wordlen,
        CAST(CASE WHEN n_sym * 10 <= n_words THEN 1 ELSE 0 END AS BIGINT) AS r3_sym,
        CAST(CASE WHEN n_bullet * 10 <= n_lines THEN 1 ELSE 0 END AS BIGINT) AS r4_bullet,
        CAST(CASE WHEN n_ell * 10 <= n_lines * 3 THEN 1 ELSE 0 END AS BIGINT) AS r5_ell,
        CAST(CASE WHEN n_alpha * 10 >= n_words * 8 THEN 1 ELSE 0 END AS BIGINT) AS r6_alpha,
        CAST(CASE WHEN n_stops >= 2 THEN 1 ELSE 0 END AS BIGINT) AS r7_stop,
        CAST(CASE WHEN $sqlGopherKeptCond THEN 1 ELSE 0 END AS BIGINT) AS kept
      FROM gc ORDER BY doc_id"""
    })

  /** Max char coverage of any single word `n`-gram in a token array:
    * `max over distinct n-grams of (occurrences x token chars of the
    * gram)`. Using the numeric max over all grams (not "chars of the
    * argmax-by-count gram") makes the statistic deterministic without
    * a tie-break rule. Gram char length excludes the n-1 joining
    * spaces [[graft.functions.TextFunctions.shingles]] inserts.
    *
    * This HOF sort+fold formulation is kept as the SEMANTIC SPEC the
    * native kernel must match (GopherRepetitionSpec differential) —
    * production runs [[graft.functions.NativeExpressions.topGramCover]]
    * instead: Catalyst higher-order functions evaluate interpreted
    * (outside whole-stage codegen) and, worse, re-evaluate once per
    * REFERENCING column after projection collapse — three coverage
    * columns feeding three flags and `kept` ran the fold stack 9x per
    * row and made C17 the slowest row of the whole bench sweep
    * (~18 s at sf0.1 vs ~0.8 s native). */
  private[graft] def topGramCoverHof(toks: Column, n: Int): Column =
    aggregate(array_sort(shingles(toks, n)),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, g) => {
        val run = when(g === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(g.as("prev"), run.as("run"),
          greatest(acc.getField("best"),
            run * (length(g).cast("long") - (n - 1))).as("best"))
      },
      acc => acc.getField("best"))

  /** C17: Gopher REPETITION filters (Rae et al. '21 "Scaling Language
    * Models" Table A1's repetition block — the companion of C16's
    * [[gopherRules]] quality block; a MassiveWeb-style pipeline runs
    * both). Per doc:
    *   r1_dupline  ≤ 30% of lines are repeats of another line
    *   r2_duppara  ≤ 30% of paragraphs are repeats
    *   r3_top2     dominant 2-gram covers ≤ 20% of token chars
    *   r4_top3     dominant 3-gram covers ≤ 18%
    *   r5_top4     dominant 4-gram covers ≤ 16%
    *
    * Definitions (shared verbatim with the DuckDB oracle): lines are
    * `\n`-split segments, paragraphs `\n\n`-split, both space-trimmed
    * with empties dropped; "repeats" = n_segments − n_distinct (the
    * first occurrence is free, every further copy counts). Words are
    * [[GopherWs]] whitespace tokens; dominant-n-gram coverage is
    * [[graft.functions.NativeExpressions.topGramCover]]'s numeric max, denominated in total token chars.
    * C6 ([[repetitionScores]]) reports the single most-repeated 2-gram
    * for ANALYSIS; this is the integer GATE over lines, paragraphs,
    * and 2–4-grams. Every test is an integer cross-multiplied
    * comparison — no float anywhere, exact and engine-portable.
    *
    * Scale shape: one shuffle-free map stage over the scan (the C16
    * shape — the gram fold stays inside the row), presentation sort is
    * the only exchange. At 100 TB: pure map, no skew surface. */
  def gopherRepetition(docs: DataFrame): DataFrame =
    gopherRepFlags(docs).orderBy("doc_id")

  /** The sort-free core of [[gopherRepetition]] — a pure stateless map
    * stage like C16's [[gopherFlags]], so it applies unchanged to a
    * STREAMING frame ([[graft.streaming.Streams.gopherRepStream]];
    * streaming plans cannot sort). Same output contract minus the
    * presentation order. */
  private[graft] def gopherRepFlags(docs: DataFrame): DataFrame =
    gopherRepFlagsRetain(docs).select(
      Seq("doc_id", "n_lines", "dup_lines", "n_paras", "dup_paras",
        "sum_chars", "top2_chars", "top3_chars", "top4_chars",
        "r1_dupline", "r2_duppara", "r3_top2", "r4_top3", "r5_top4", "kept")
        .map(col): _*)

  /** [[gopherRepFlags]] with the input columns retained — the
    * streaming-composition form, like [[gopherFlagsRetain]]. */
  private[graft] def gopherRepFlagsRetain(docs: DataFrame): DataFrame = {
    val toksC = filter(split(col("text"), GopherWs + "+"), t => t =!= "")
    val linesC = filter(transform(split(col("text"), "\n"), l => trim(l)),
      l => l =!= "")
    val parasC = filter(transform(split(col("text"), "\n\n"), p => trim(p)),
      p => p =!= "")
    val counted = docs
      .withColumn("n_lines", size(linesC).cast("long"))
      .withColumn("dup_lines",
        (size(linesC) - size(array_distinct(linesC))).cast("long"))
      .withColumn("n_paras", size(parasC).cast("long"))
      .withColumn("dup_paras",
        (size(parasC) - size(array_distinct(parasC))).cast("long"))
      .withColumn("sum_chars",
        aggregate(transform(toksC, t => length(t).cast("long")), lit(0L),
          (a, x) => a + x))
      .withColumn("top2_chars", graft.functions.NativeExpressions.topGramCover(toksC, 2))
      .withColumn("top3_chars", graft.functions.NativeExpressions.topGramCover(toksC, 3))
      .withColumn("top4_chars", graft.functions.NativeExpressions.topGramCover(toksC, 4))
    val flags = Seq(
      "r1_dupline" -> (col("dup_lines") * 10L <= col("n_lines") * 3L),
      "r2_duppara" -> (col("dup_paras") * 10L <= col("n_paras") * 3L),
      "r3_top2" -> (col("top2_chars") * 5L <= col("sum_chars")),
      "r4_top3" -> (col("top3_chars") * 50L <= col("sum_chars") * 9L),
      "r5_top4" -> (col("top4_chars") * 25L <= col("sum_chars") * 4L))
    flags.foldLeft(counted) { case (df, (nm, c)) =>
        df.withColumn(nm, when(c, 1L).otherwise(0L))
      }
      .withColumn("kept", flags.map(_._2).reduce(_ && _).cast("long"))
  }

  /** Oracle row: the DuckDB side computes dominant-gram coverage the
    * NAIVE way (explode grams, GROUP BY (doc, gram), max of
    * count×chars) — hash-equality against the native kernel's hashed
    * single-pass fold doubles as the fold's losslessness proof (the
    * D4b pattern). */
  /** C17's base/counts/sel CTE chain over `tbl` (CTE names rbase, rc,
    * rsel — collision-free when combined with [[sqlGopherCountsCte]]
    * in the D17 composed-pipeline oracle, which shares this builder
    * with the flags oracle below). */
  private[queries] def sqlGopherRepCtes(tbl: String): String = {
    def top(n: Int): String = {
      val sh = sqlShingles("w", n)
      s"""(SELECT doc_id, CAST(max(c * (length(g) - ${n - 1})) AS BIGINT)
            AS top${n}_chars
          FROM (SELECT doc_id, g, count(*) AS c
            FROM (SELECT doc_id, unnest($sh) AS g FROM rbase)
            GROUP BY doc_id, g)
          GROUP BY doc_id)"""
    }
    s"""rbase AS (
        SELECT doc_id,
          list_filter(string_split_regex(text, '${GopherWs}+'), t -> t <> '') AS w,
          list_filter(list_transform(string_split(text, chr(10)),
            l -> trim(l)), l -> l <> '') AS lns,
          list_filter(list_transform(string_split(text, chr(10)||chr(10)),
            p -> trim(p)), p -> p <> '') AS ps
        FROM $tbl),
      rc AS (
        SELECT doc_id,
          CAST(len(lns) AS BIGINT) AS n_lines,
          CAST(len(lns) - len(list_distinct(lns)) AS BIGINT) AS dup_lines,
          CAST(len(ps) AS BIGINT) AS n_paras,
          CAST(len(ps) - len(list_distinct(ps)) AS BIGINT) AS dup_paras,
          CAST(coalesce(list_sum(list_transform(w, t -> length(t))), 0)
            AS BIGINT) AS sum_chars
        FROM rbase),
      rsel AS (
        SELECT rc.doc_id, n_lines, dup_lines, n_paras, dup_paras, sum_chars,
          CAST(coalesce(top2_chars, 0) AS BIGINT) AS top2_chars,
          CAST(coalesce(top3_chars, 0) AS BIGINT) AS top3_chars,
          CAST(coalesce(top4_chars, 0) AS BIGINT) AS top4_chars
        FROM rc
          LEFT JOIN ${top(2)} t2 ON rc.doc_id = t2.doc_id
          LEFT JOIN ${top(3)} t3 ON rc.doc_id = t3.doc_id
          LEFT JOIN ${top(4)} t4 ON rc.doc_id = t4.doc_id)"""
  }

  /** C17's composed kept condition over the `rsel` columns. */
  private[queries] val sqlGopherRepKeptCond: String =
    """dup_lines * 10 <= n_lines * 3
          AND dup_paras * 10 <= n_paras * 3
          AND top2_chars * 5 <= sum_chars
          AND top3_chars * 50 <= sum_chars * 9
          AND top4_chars * 25 <= sum_chars * 4"""

  /** The final SELECT over [[sqlGopherRepCtes]]'s `rsel` — shared by
    * the documents row and the derived-pages row (LineFilters). */
  private[queries] val sqlGopherRepSelect: String =
    s"""SELECT doc_id, n_lines, dup_lines, n_paras, dup_paras, sum_chars,
        top2_chars, top3_chars, top4_chars,
        CAST(CASE WHEN dup_lines * 10 <= n_lines * 3 THEN 1 ELSE 0 END AS BIGINT) AS r1_dupline,
        CAST(CASE WHEN dup_paras * 10 <= n_paras * 3 THEN 1 ELSE 0 END AS BIGINT) AS r2_duppara,
        CAST(CASE WHEN top2_chars * 5 <= sum_chars THEN 1 ELSE 0 END AS BIGINT) AS r3_top2,
        CAST(CASE WHEN top3_chars * 50 <= sum_chars * 9 THEN 1 ELSE 0 END AS BIGINT) AS r4_top3,
        CAST(CASE WHEN top4_chars * 25 <= sum_chars * 4 THEN 1 ELSE 0 END AS BIGINT) AS r5_top4,
        CAST(CASE WHEN $sqlGopherRepKeptCond THEN 1 ELSE 0 END AS BIGINT) AS kept
      FROM rsel ORDER BY doc_id"""

  val qGopherRep: Q = Q(
    "q_gopher_rep",
    (s, d) => gopherRepetition(Tables.documents(s, d)),
    Some(s"WITH ${sqlGopherRepCtes("documents")}\n      " + sqlGopherRepSelect))

  /** C4: document fingerprinting — md5 plus the portable 64-bit polynomial
    * rolling hash over normalized text (SURVEY.md §3). */
  /** Public API: md5 + rolling-hash fingerprints per doc. */
  def fingerprints(docs: DataFrame): DataFrame =
      docs
        .select(col("doc_id"),
          md5(normText(col("text"))).as("md5_hash"),
          polyHash(normText(col("text"))).as("poly_hash"))
        .orderBy("doc_id")

  val qFingerprint: Q = Q(
    "q_fingerprint",
    (s, d) => fingerprints(Tables.documents(s, d)),
    Some(s"""SELECT doc_id,
      md5(${sqlNormText("text")}) AS md5_hash,
      ${sqlPolyHash(sqlNormText("text"))} AS poly_hash
      FROM documents ORDER BY doc_id"""))

  /** C5: word 3-gram shingling — per-doc shingle counts and distinct
    * ratios (the dedup-candidate front end, standalone here). */
  /** Public API: shingle counts per doc. Counts run over the poly
    * HASHES of the shingles (one native pass, no string
    * materialization); "distinct" is therefore distinct-up-to-shared-
    * hash-collision, reproduced exactly by the oracle. */
  def shingleStats(docs: DataFrame): DataFrame = {
      val hs = graft.functions.NativeExpressions.shingleHashes(col("text"), 3)
      docs
        .select(
          col("doc_id"),
          size(hs).cast("long").as("n_shingles"),
          size(array_distinct(hs)).cast("long").as("n_distinct"))
        .orderBy("doc_id")
  }

  val qShingles: Q = Q(
    "q_shingles",
    (s, d) => shingleStats(Tables.documents(s, d)),
    Some {
      val sh = sqlShingles("w", 3)
      s"""SELECT doc_id,
        len(sh) AS n_shingles,
        len(list_distinct(list_transform(sh, s -> ${sqlPolyHash("s")}))) AS n_distinct
      FROM (SELECT doc_id, ($sh) AS sh FROM
        (SELECT doc_id, list_filter(${sqlWords("text")}, t -> t <> '') AS w FROM documents) t1) t2
      ORDER BY doc_id"""
    })

  /** C6: intra-document repetition — the "spam spam spam" detector of a
    * training-data quality gate. Signals over word 2-gram hashes (kept
    * WITH duplicates, unlike the dedup pipeline's distinct sets):
    * `max_rep` = the most-repeated 2-gram's count (native
    * [[graft.functions.NativeExpressions.MaxMultiplicity]] — one sorted
    * pass per row, so the whole query is a shuffle-free map stage where
    * the relational explode→count→max formulation shuffles every n-gram
    * twice; the ORACLE runs exactly that relational formulation, proving
    * the kernel), plus duplicate-mass and distinct ratios. Integer
    * counts, single double division each — cross-engine exact. */
  /** Public API: repetition signals per doc. */
  def repetitionStats(docs: DataFrame): DataFrame = {
      val hs = graft.functions.NativeExpressions.shingleHashes(col("text"), 2)
      docs
        .select(
          col("doc_id"),
          size(hs).cast("long").as("n_grams"),
          size(array_distinct(hs)).cast("long").as("n_distinct"),
          graft.functions.NativeExpressions.maxMultiplicity(hs).as("max_rep"))
        .withColumn("rep_ratio",
          col("max_rep").cast("double") / greatest(col("n_grams"), lit(1L)))
        .withColumn("dup_ratio",
          (col("n_grams") - col("n_distinct")).cast("double") /
            greatest(col("n_grams"), lit(1L)))
        .orderBy("doc_id")
  }

  val qRepetition: Q = Q(
    "q_repetition",
    (s, d) => repetitionStats(Tables.documents(s, d)),
    Some(s"""WITH toks AS (
        SELECT doc_id, list_filter(${sqlWords("text")}, t -> t <> '') AS w
        FROM documents),
      sh AS (
        SELECT doc_id, list_transform(${sqlShingles("w", 2)},
          s -> ${sqlPolyHash("s")}) AS hs
        FROM toks),
      ex AS (SELECT doc_id, unnest(hs) AS s FROM sh),
      cnt AS (SELECT doc_id, s, count(*) AS c FROM ex GROUP BY doc_id, s),
      rep AS (SELECT doc_id, max(c) AS max_rep FROM cnt GROUP BY doc_id)
      SELECT sh.doc_id,
        CAST(len(hs) AS BIGINT) AS n_grams,
        CAST(len(list_distinct(hs)) AS BIGINT) AS n_distinct,
        coalesce(rep.max_rep, 0) AS max_rep,
        CAST(coalesce(rep.max_rep, 0) AS DOUBLE) / greatest(len(hs), 1) AS rep_ratio,
        CAST(len(hs) - len(list_distinct(hs)) AS DOUBLE) / greatest(len(hs), 1) AS dup_ratio
      FROM sh LEFT JOIN rep ON sh.doc_id = rep.doc_id
      ORDER BY sh.doc_id"""))

  /** C12: bigram collocation mining by pointwise mutual information —
    * the corpus-statistics pass behind phrase extraction, tokenizer
    * audits, and vocabulary induction in a training-data pipeline
    * (Church & Hanks 1990). A bigram's PMI compares its observed corpus
    * frequency against independence:
    * `pmi = ln(p(w1,w2) / (p(w1)·p(w2)))` with `p(w1,w2) = n_pair /
    * n_big` and `p(w) = c_w / n_uni`.
    *
    * Scale shape: ONE corpus scan per counting branch (unigrams,
    * bigrams), each a map-side-combinable hash agg whose key space is
    * vocabulary-sized, never corpus-sized — both count frames are
    * memo-persisted ([[graft.ops.PlanCache]]), since the plan branches
    * over each 2–3 times (w1 join, w2 join, total) and exchange reuse
    * can't collapse differently-pruned subtrees; without the memo the
    * corpus is tokenized ~5×. The two count totals ride as 1-row
    * broadcast frames; the unigram joins hit the minCount-filtered
    * bigram frame (collocation candidates, tiny) and shuffle
    * (word, count) pairs only — no text, no broadcast of the unbounded
    * vocabulary. Global top-N is `orderBy().limit()` =
    * TakeOrderedAndProject (per-partition bounded heaps + driver merge
    * of topN rows), NOT a single-partition window.
    *
    * Determinism: counts are exact integers and `lift` (the PMI
    * argument, `p(w1,w2) / (p(w1)·p(w2))`) is a fixed-order
    * product/division of count-valued doubles — exact below 2^53,
    * hash-exact cross-engine. `pmi = ln(lift)` is API-only: JVM
    * `Math.log` and libm disagree by 1 ULP on some arguments (observed
    * at lift = 1.4190603030910545), so the oracle row compares `lift`
    * and drops `pmi` — same ranking (ln is monotone), no
    * engine-dependent transcendental in the hash. */
  def collocations(docs: DataFrame, minCount: Long = 5L, topN: Int = 25): DataFrame = {
    val toks = words(col("text"))
    val uni = countCache.memo(docs.select(explode(toks).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c_w")))
    val big = countCache.memo(docs.select(explode(shingles(toks, 2)).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("n_pair")))
    val nUni = uni.agg(sum(col("c_w")).as("n_uni"))
    val nBig = big.agg(sum(col("n_pair")).as("n_big"))
    val u1 = uni.select(col("w").as("w1"), col("c_w").as("c_w1"))
    val u2 = uni.select(col("w").as("w2"), col("c_w").as("c_w2"))
    big.filter(col("n_pair") >= minCount)
      .withColumn("w1", element_at(split(col("bigram"), " "), 1))
      .withColumn("w2", element_at(split(col("bigram"), " "), 2))
      .join(u1, "w1").join(u2, "w2")
      .crossJoin(broadcast(nUni)).crossJoin(broadcast(nBig))
      .select(col("bigram"), col("n_pair"), col("c_w1"), col("c_w2"),
        (col("n_pair").cast("double") * col("n_uni").cast("double") *
          col("n_uni").cast("double") /
          (col("c_w1").cast("double") * col("c_w2").cast("double") *
            col("n_big").cast("double"))).as("lift"))
      .withColumn("pmi", log(col("lift")))
      .orderBy(col("lift").desc, col("bigram"))
      .limit(topN)
  }

  val qCollocations: Q = Q(
    "q_collocations",
    (s, d) => collocations(Tables.documents(s, d)).drop("pmi"),
    Some {
      val sh2 = sqlShingles("w", 2)
      s"""WITH toks AS (
        SELECT doc_id, list_filter(${sqlWords("text")}, t -> t <> '') AS w
        FROM documents),
      uni AS (SELECT unnest(w) AS wd FROM toks),
      uc AS (SELECT wd, count(*) AS c_w FROM uni GROUP BY 1),
      bigs AS (SELECT unnest($sh2) AS bigram FROM toks),
      bc AS (SELECT bigram, count(*) AS n_pair FROM bigs GROUP BY 1),
      tot AS (SELECT (SELECT sum(c_w) FROM uc) AS n_uni,
                     (SELECT sum(n_pair) FROM bc) AS n_big)
      SELECT bigram, n_pair, u1.c_w AS c_w1, u2.c_w AS c_w2,
        (n_pair::DOUBLE * n_uni::DOUBLE * n_uni::DOUBLE) /
           (u1.c_w::DOUBLE * u2.c_w::DOUBLE * n_big::DOUBLE) AS lift
      FROM bc CROSS JOIN tot
      JOIN uc u1 ON string_split(bigram, ' ')[1] = u1.wd
      JOIN uc u2 ON string_split(bigram, ' ')[2] = u2.wd
      WHERE n_pair >= 5
      ORDER BY lift DESC, bigram LIMIT 25"""
    })

  /** C14: token-window chunking — the context-window prep step before
    * embedding / eval scoring / packed pretraining of long documents:
    * each doc becomes overlapping windows of `window` tokens advancing
    * by `stride` (the last window keeps the tail, shorter than
    * `window` when the doc doesn't divide evenly; docs shorter than
    * one window yield exactly one chunk; token-less docs yield none).
    *
    * Scale shape: pure per-row generation — one tokenizer pass, a
    * sequence-explode of ceil((len−window)/stride)+1 chunk indices,
    * and slices of the already-materialized token array. No shuffle
    * at all until the presentation sort; at 100 TB this is a map-only
    * stage that composes with downstream embedding or packing.
    *
    * `stride ≤ window` is required: a gap stride would fabricate
    * empty chunks past the tail (and silently drop tokens — never a
    * chunking contract anyone wants). */
  def chunkTokens(docs: DataFrame, window: Int = 128, stride: Int = 64): DataFrame = {
    require(window >= 1 && stride >= 1, s"window=$window, stride=$stride must be >= 1")
    require(stride <= window,
      s"stride=$stride > window=$window would skip tokens and emit empty tail chunks")
    val (w, s) = (lit(window), lit(stride))
    docs.select(col("doc_id"), words(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).cast("long").as("len"))
      .filter(col("len") > 0)
      .select(col("doc_id"), col("toks"), col("len"),
        explode(sequence(lit(0L),
          when(col("len") <= window, lit(0L))
            .otherwise(floor((col("len") - window + (stride - 1)) / stride)))).as("k"))
      .select(col("doc_id"), col("k").as("chunk_idx"),
        (col("k") * s + 1).as("start_tok"),
        least(w.cast("long"), col("len") - (col("k") * s + 1) + 1).as("n_tokens"),
        concat_ws(" ", slice(col("toks"), (col("k") * s + 1).cast("int"), w))
          .as("chunk_text"))
      .orderBy("doc_id", "chunk_idx")
  }

  val qChunkTokens: Q = Q(
    "q_chunk_tokens",
    (s, d) => chunkTokens(Tables.documents(s, d), window = 32, stride = 16),
    Some(s"""WITH toks AS (
        SELECT doc_id, list_filter(${sqlWords("text")}, t -> t <> '') AS w
        FROM documents),
      t2 AS (SELECT doc_id, w, len(w) AS len FROM toks WHERE len(w) > 0),
      ks AS (
        SELECT doc_id, w, len,
          unnest(range(0, CASE WHEN len <= 32 THEN 1
            ELSE 1 + (len - 32 + 15) // 16 END)) AS k
        FROM t2)
      SELECT doc_id, k AS chunk_idx,
        k * 16 + 1 AS start_tok,
        least(32, len - (k * 16 + 1) + 1) AS n_tokens,
        array_to_string(w[(k * 16 + 1):(k * 16 + 32)], ' ') AS chunk_text
      FROM ks
      ORDER BY doc_id, chunk_idx"""))

  val all: Seq[Q] =
    Seq(qTokens, qLangId, qQuality, qQualityDeciles, qFingerprint, qShingles,
      qRepetition, qCollocations, qChunkTokens, qGopherRules, qGopherRep)
}
