package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

/** MapReduce-surface workloads re-expressed as declarative plans
  * (SURVEY.md §2 A3–A6). Each is the Spark-native form of a reference
  * mrapp: the explode→groupBy pipeline gets map-side partial aggregation
  * and a single hash shuffle on the word key — exactly the
  * `ihash(key) % NReduce` partitioning of /root/reference/src/mr/worker.go:16
  * but chosen and executed by Catalyst/Tungsten.
  */
object TextQueries {

  /** A3: word count (/root/reference/src/mrapps/wc.go). */
  /** Public API: word count over any (text) frame. */
  def wordCount(docs: DataFrame): DataFrame =
      docs
        .select(explode(words(col("text"))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("n"))
        .orderBy("word")

  val qWordcount: Q = Q(
    "q_wordcount",
    (s, d) => wordCount(Tables.documents(s, d)),
    Some(s"""SELECT w AS word, count(*) AS n
      FROM (SELECT unnest(${sqlWords("text")}) AS w FROM documents) t
      WHERE w <> '' GROUP BY w ORDER BY word"""))

  /** A4: inverted index (/root/reference/src/mrapps/indexer.go:20-39):
    * word -> distinct-doc count + sorted comma-joined doc list. Docs are
    * identified by zero-padded doc_id so lexicographic order == numeric.
    *
    * Scale shape: the naive `collect_set(doc_id)` holds EVERY doc for a
    * stopword key in one aggregation buffer — multi-GB state on a single
    * key at 100 TB. Here the posting list is capped at the
    * `maxDocsPerWord` SMALLEST doc_ids (a rank over the distinct pairs —
    * sort-based, spillable — then a null-filtered collect whose state is
    * bounded at the cap), while `n_docs` stays exact via a plain count of
    * the distinct pairs. Truncation is surfaced in its own column rather
    * than silently. */
  /** Posting-list cap shared by the [[invertedIndex]] default AND the
    * oracle SQL below — one constant so neither side can drift. */
  private val MaxDocsPerWord = 100000

  /** Public API: inverted index over any (doc_id, text) frame. */
  def invertedIndex(docs: DataFrame, maxDocsPerWord: Int = MaxDocsPerWord): DataFrame = {
      val pairs = docs
        .select(col("doc_id"), explode(words(col("text"))).as("word"))
        .distinct()
      val byWord = org.apache.spark.sql.expressions.Window
        .partitionBy(col("word")).orderBy(col("doc_id"))
      pairs
        .withColumn("rn", row_number().over(byWord))
        .groupBy("word")
        // aggregate LONG ids (8-byte state, integer sort), format to the
        // zero-padded doc labels only once per distinct id at the end.
        // NB: the cap relies on collect_list SKIPPING the nulls that the
        // unmatched `when` produces — swapping in array_agg/collect_set
        // variants that keep nulls would change semantics
        .agg(count(lit(1)).as("n_docs"),
          array_sort(collect_list(when(col("rn") <= maxDocsPerWord, col("doc_id")))).as("ids"))
        .select(col("word"), col("n_docs"),
          array_join(transform(col("ids"), d => format_string("d%06d", d)), ",").as("docs"),
          (col("n_docs") > maxDocsPerWord).as("truncated"))
        .orderBy("word")
  }

  val qInvertedIndex: Q = Q(
    "q_inverted_index",
    (s, d) => invertedIndex(Tables.documents(s, d)),
    Some(s"""WITH pairs AS (
        SELECT DISTINCT doc_id, w
        FROM (SELECT doc_id, unnest(${sqlWords("text")}) AS w FROM documents) t
        WHERE w <> ''),
      rn AS (SELECT w, doc_id,
        row_number() OVER (PARTITION BY w ORDER BY doc_id) AS rn FROM pairs)
      SELECT w AS word, count(*) AS n_docs,
        string_agg(CASE WHEN rn <= $MaxDocsPerWord THEN printf('d%06d', doc_id) END, ','
          ORDER BY doc_id) AS docs,
        count(*) > $MaxDocsPerWord AS truncated
      FROM rn GROUP BY w ORDER BY word"""))

  /** A5: distributed grep — regex hit counts per matching doc. The filter
    * prunes non-matching docs before the (cheap) per-row count; at scale
    * this is a full scan with predicate applied in the scan stage, no
    * shuffle at all until the final order. */
  /** Public API: regex hit counts per doc (pattern fixed for the
    * oracle-checked entry; use grep(docs, pattern) for arbitrary ones). */
  def grep(docs: DataFrame, pattern: String = "spark|shuffle"): DataFrame =
      docs
        .select(col("doc_id"),
          size(regexp_extract_all(lower(col("text")), lit(pattern), lit(0))).cast("long").as("n_hits"))
        .filter(col("n_hits") > 0)
        .orderBy("doc_id")

  val qGrep: Q = Q(
    "q_grep",
    (s, d) => grep(Tables.documents(s, d)),
    Some("""SELECT doc_id, CAST(len(regexp_extract_all(lower(text), 'spark|shuffle')) AS BIGINT) AS n_hits
      FROM documents
      WHERE len(regexp_extract_all(lower(text), 'spark|shuffle')) > 0
      ORDER BY doc_id"""))

  /** A6: per-file/source record stats (early_exit.go family: one count per
    * input file). */
  /** Public API: per-source record stats. */
  def docStatsPerSource(docs: DataFrame): DataFrame =
      docs
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
        .orderBy("source")

  val qDocStatsPerSource: Q = Q(
    "q_doc_stats_per_source",
    (s, d) => docStatsPerSource(Tables.documents(s, d)),
    Some("""SELECT source, count(*) AS n_docs,
      CAST(sum(n_chars) AS BIGINT) AS total_chars,
      min(doc_id) AS first_doc, max(doc_id) AS last_doc
      FROM documents GROUP BY source ORDER BY source"""))

  val all: Seq[Q] = Seq(qWordcount, qInvertedIndex, qGrep, qDocStatsPerSource)
}
