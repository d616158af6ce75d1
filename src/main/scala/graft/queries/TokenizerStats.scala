package graft.queries

import graft.{Q, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** C19: tokenizer fertility census per source under the frozen BPE
  * merge table — the tokenizer-QA / cost-model row: a trainer budgets
  * in BPE tokens, so "how many tokens does each corpus slice cost, and
  * how fertile is its text" (tokens per word, chars per token) is what
  * decides mixing weights and shard budgets BEFORE packing (H8b) runs.
  * Divergent fertility across slices is also the standard symptom of a
  * tokenizer mis-fit to a domain (Rust et al. ACL'21 measure exactly
  * tokens-per-word fertility across languages).
  *
  *   (source, n_docs, n_words, n_chars, n_bpe, fertility, chars_per_token)
  *
  * fertility = n_bpe/n_words, chars_per_token = n_chars/n_bpe — each a
  * SINGLE double division of two exact integer sums (IEEE-identical
  * cross-engine; the H9 rule of keeping float ops to one final step).
  *
  * Scale shape: the C13/H8b encoder split — the merge automaton runs
  * once per DISTINCT word ([[Tokenizer.bpeWordCounts]], vocabulary-
  * sized typed map with the rank table broadcast), the corpus side is
  * one explode + a broadcast word-key join + a map-side-combinable agg
  * on the tiny source domain. Wordless docs count via the separate
  * doc-count agg (no explode row to lose them from). At 100 TB: one
  * text scan, no corpus-sized shuffle — the widest exchange is the
  * word-keyed partial-agg output.
  *
  * The DuckDB oracle replays the greedy encoder itself as the H8b
  * recursive CTE, so the hash match proves encoder + fertility join +
  * census in one check.
  */
object TokenizerStats {

  def bpeFertility(
      docs: DataFrame,
      merges: Seq[((String, String), String)] = Tokenizer.FixedMerges): DataFrame = {
    val perWord = Tokenizer.bpeWordCounts(docs, merges)
    val agg = graft.ops.ScaleOps.widenScan(docs, "doc_id")
      .select(col("source"), explode(words(col("text"))).as("word"))
      .join(perWord, "word") // perWord covers every distinct corpus word
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_words"),
        sum(length(col("word")).cast("long")).as("n_chars"),
        sum(col("n_subtokens")).as("n_bpe"))
    docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
      .join(agg, Seq("source"), "left") // all-wordless sources stay
      .select(
        col("source"),
        col("n_docs"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_chars"), lit(0L)).as("n_chars"),
        coalesce(col("n_bpe"), lit(0L)).as("n_bpe"),
        when(coalesce(col("n_words"), lit(0L)) > 0L,
          coalesce(col("n_bpe"), lit(0L)).cast("double") / col("n_words"))
          .otherwise(lit(0.0)).as("fertility"),
        when(coalesce(col("n_bpe"), lit(0L)) > 0L,
          coalesce(col("n_chars"), lit(0L)).cast("double") / col("n_bpe"))
          .otherwise(lit(0.0)).as("chars_per_token"))
      .orderBy("source")
  }

  /** Oracle row: runs on [[Tokenizer.LearnedMerges]] — the 96-deep
    * table learned from sf0.1 — so the recursive-CTE encoder replay is
    * proved at realistic depth (~6 merge steps per word vs the 64-merge
    * frozen table's 2–3) while H8b keeps [[Tokenizer.FixedMerges]]
    * exercised; mean fertility 1.355 keeps the census non-degenerate. */
  val qBpeFertility: Q = Q(
    "q_bpe_fertility",
    (s, d) => bpeFertility(Tables.documents(s, d), Tokenizer.LearnedMerges),
    Some(s"""WITH RECURSIVE
        ${Shards.sqlBpeWordCountsFrom("documents", "text", Tokenizer.LearnedMerges)},
        d AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
          FROM documents GROUP BY source),
        u AS (SELECT source,
            unnest(list_filter(${sqlWords("text")}, t -> t <> '')) AS word
          FROM documents),
        agg AS (SELECT source,
            CAST(count(*) AS BIGINT) AS n_words,
            CAST(sum(length(word)) AS BIGINT) AS n_chars,
            CAST(sum(wc.n_sub) AS BIGINT) AS n_bpe
          FROM u JOIN wc USING (word) GROUP BY source)
      SELECT d.source, d.n_docs,
        CAST(coalesce(a.n_words, 0) AS BIGINT) AS n_words,
        CAST(coalesce(a.n_chars, 0) AS BIGINT) AS n_chars,
        CAST(coalesce(a.n_bpe, 0) AS BIGINT) AS n_bpe,
        CASE WHEN coalesce(a.n_words, 0) > 0
          THEN CAST(a.n_bpe AS DOUBLE) / a.n_words ELSE 0.0 END AS fertility,
        CASE WHEN coalesce(a.n_bpe, 0) > 0
          THEN CAST(a.n_chars AS DOUBLE) / a.n_bpe ELSE 0.0 END AS chars_per_token
      FROM d LEFT JOIN agg a USING (source)
      ORDER BY source"""))

  /** C13b: the tokenizer's OUTPUT oracled token-by-token — every
    * (doc, position, token id) the trainer-facing
    * [[Tokenizer.tokenizeDocs]] emits, exploded to long form so the
    * DuckDB hash covers id assignment, per-word greedy encoding, AND
    * word-order reassembly in one check. The oracle replays the whole
    * path: the H8b recursive-CTE encoder gives each distinct word's
    * final symbol sequence (`wseq`), [[Tokenizer.vocabSqlValues]]
    * replays the id table, and a row_number over (word position,
    * within-word position) rebuilds the global token positions. */
  val qTokenizeIds: Q = Q(
    "q_tokenize_ids",
    (s, d) => Tokenizer.tokenizeDocs(Tables.documents(s, d))
      .select(col("doc_id"),
        posexplode(col("tokens")).as(Seq("pos", "token_id")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("token_id").cast("long").as("token_id"))
      .orderBy("doc_id", "pos"),
    Some(s"""WITH RECURSIVE
        ${Shards.sqlBpeWordCountsFrom("documents", "text")},
        vocab(sym, id) AS (VALUES ${Tokenizer.vocabSqlValues(Tokenizer.FixedMerges)}),
        wsyms AS (SELECT word,
            list_filter(string_split(fseq, '|'), s -> s <> '') AS syms
          FROM wseq),
        wsym AS (SELECT word,
            CAST(generate_subscripts(syms, 1) AS BIGINT) AS ipos,
            unnest(syms) AS sym
          FROM wsyms),
        wid AS (SELECT word, ipos, v.id FROM wsym JOIN vocab v USING (sym)),
        dwords AS (SELECT doc_id,
            CAST(generate_subscripts(ws, 1) AS BIGINT) AS wpos,
            unnest(ws) AS word
          FROM (SELECT doc_id,
              list_filter(${sqlWords("text")}, t -> t <> '') AS ws
            FROM documents)),
        flat AS (SELECT d.doc_id, d.wpos, w.ipos, w.id
          FROM dwords d JOIN wid w USING (word))
      SELECT doc_id,
        CAST(row_number() OVER (PARTITION BY doc_id
          ORDER BY wpos, ipos) - 1 AS BIGINT) AS pos,
        CAST(id AS BIGINT) AS token_id
      FROM flat ORDER BY doc_id, pos"""))

  val all: Seq[Q] = Seq(qBpeFertility, qTokenizeIds)
}
