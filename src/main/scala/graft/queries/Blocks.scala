package graft.queries

import graft.{Q, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Block-level exact dedup (SURVEY.md §2 D10) — corpus REWRITING, not
  * just flagging: every repeated block of [[BlockWords]] consecutive
  * words is removed from all but its first occurrence corpus-wide, and
  * each document is reassembled from its surviving blocks. This is the
  * block-granularity form of exact-substring training-data dedup (Lee
  * et al., "Deduplicating Training Data Makes Language Models Better",
  * ACL'22): boilerplate/licence headers/templated passages repeated
  * across millions of pages get excised once-and-for-all while the
  * unique remainder of each document survives — doc-level dedup (D1)
  * can't touch those, it only drops whole-document copies.
  *
  * First-occurrence is the GLOBAL (doc_id, block_idx) lexicographic
  * minimum per distinct block content — a total order, so the survivor
  * set is deterministic and the DuckDB oracle reproduces it exactly.
  *
  * Scale shape: two wide shuffles, which is the floor for a
  * corpus-rewriting dedup — (1) the keep-decision window partitions on
  * `md5(block)` (an unordered `min(struct)` frame, no per-key sort),
  * (2) reassembly groups by doc_id. Block text rides both shuffles
  * because the rewrite needs it back; a narrow-decision variant
  * (shuffle only (md5, doc_id, idx) and re-join decisions to
  * recomputed blocks) trades the wide window shuffle for an extra
  * corpus-wide join — worth it only when blocks >> the 32-byte
  * decision row, i.e. large [[BlockWords]]. Skewed block keys (a
  * boilerplate block repeated 1e9×) hash-spread fine: the window key
  * is the 128-bit md5, and AQE splits oversized partitions.
  */
object Blocks {

  /** Words per block. Real pipelines use 50–100-token windows; 8 keeps
    * the ~50-word synthetic docs at a handful of blocks each. */
  val BlockWords = 8

  /** Rewrite any (doc_id, text) frame: per-doc block counts, the
    * duplicated-mass ratio, and the poly hash of the reassembled
    * surviving text (docs whose every block was seen earlier hash the
    * empty string, i.e. 0). */
  def blockDedup(docs: DataFrame): DataFrame = {
    val B = BlockWords
    val blocks = docs
      .select(col("doc_id"), words(col("text")).as("w"))
      .filter(size(col("w")) > 0)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), ((size(col("w")) + (B - 1)) / B).cast("int") - 1),
          i => array_join(slice(col("w"), i * B + 1, lit(B)), " "))))
      .withColumnRenamed("pos", "idx").withColumnRenamed("col", "block")
    // global first occurrence per distinct block content; min over the
    // whole partition (no ORDER BY -> no per-key sort in the window)
    val first = min(struct(col("doc_id"), col("idx")))
      .over(Window.partitionBy(md5(col("block"))))
    blocks
      .withColumn("keep", struct(col("doc_id"), col("idx")) === first)
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_blocks"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        // surviving blocks back in document order; collect_list drops
        // the nulls the `when` leaves for excised blocks
        polyHash(array_join(
          transform(
            array_sort(collect_list(when(col("keep"),
              struct(col("idx"), col("block"))))),
            x => x.getField("block")),
          " ")).as("kept_hash"))
      .select(
        col("doc_id"), col("n_blocks"), col("n_kept"),
        ((col("n_blocks") - col("n_kept")).cast("double") / col("n_blocks"))
          .as("dup_ratio"),
        col("kept_hash"))
      .orderBy("doc_id")
  }

  val qDedupBlocks: Q = Q(
    "q_dedup_blocks",
    (s, d) => blockDedup(Tables.documents(s, d)),
    Some {
      val B = BlockWords
      s"""WITH toks AS (
          SELECT doc_id, list_filter(${sqlWords("text")}, t -> t <> '') AS w
          FROM documents),
        idxed AS (
          SELECT doc_id, w,
            unnest(generate_series(0, CAST((len(w) + ${B - 1}) // $B AS BIGINT) - 1)) AS idx
          FROM toks WHERE len(w) > 0),
        blk AS (
          SELECT doc_id, idx,
            array_to_string(w[idx*$B+1 : idx*$B+$B], ' ') AS block
          FROM idxed),
        ann AS (
          SELECT doc_id, idx, block,
            (doc_id, idx) = min((doc_id, idx)) OVER (PARTITION BY md5(block)) AS keep
          FROM blk),
        agg AS (
          SELECT doc_id,
            count(*) AS n_blocks,
            sum(CASE WHEN keep THEN 1 ELSE 0 END) AS n_kept,
            coalesce(string_agg(block, ' ' ORDER BY idx) FILTER (WHERE keep), '') AS kept
          FROM ann GROUP BY doc_id)
        SELECT doc_id,
          CAST(n_blocks AS BIGINT) AS n_blocks,
          CAST(n_kept AS BIGINT) AS n_kept,
          CAST(n_blocks - n_kept AS DOUBLE) / n_blocks AS dup_ratio,
          ${sqlPolyHash("kept")} AS kept_hash
        FROM agg ORDER BY doc_id"""
    })

  val all: Seq[Q] = Seq(qDedupBlocks)
}
