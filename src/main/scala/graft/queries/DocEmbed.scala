package graft.queries

import graft.{Q, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** E9: feature-hashed document embeddings (the hashing trick,
  * Weinberger et al. ICML'09 — Spark ML's HashingTF with signed
  * hashing) — the TEXT → VECTOR bridge that makes the corpus itself
  * ANN-searchable with no external model: every word occurrence
  * contributes sign(h) at dimension h mod d, where h is the portable
  * polynomial hash (the engine's one shared hash — so the embedding
  * reproduces bit-exactly in SQL, unlike murmur-based HashingTF). The
  * signed variant keeps E[<v_a, v_b>] proportional to the true tf
  * overlap (unsigned hashing biases it upward by the collision mass).
  *
  * Components are INTEGER sums of ±1 contributions — commutative,
  * shuffle-safe, oracle-exact with no float anywhere; [[docEmbedVectors]]
  * densifies them into the `(vec_id, embedding)` contract the whole
  * E-family consumes (near-dup pairs via [[Similarity.embeddingDupPairs]],
  * ANN via the IVF/PQ stack, SemDeDup via [[Similarity.semanticDedup]]).
  *
  * Scale shape: one tokenize+explode pass, one map-side-combinable
  * hash agg on (doc_id, dim) keys — output is sparse (≤ min(words,
  * dims) rows per doc), text never shuffles (only (doc_id, dim, ±1)
  * partials). The densifier adds one doc_id-keyed agg. At 100 TB this
  * is the cheapest possible corpus embedding: exactly one scan.
  */
object DocEmbed {

  val DefaultDims = 64

  /** Sparse long-format embedding: (doc_id, dim, q) with q = Σ over
    * word occurrences hashing to `dim` of the occurrence's sign;
    * zero-sum dims are ABSENT (sparse contract). Docs with no words
    * emit no rows here — [[docEmbedVectors]] restores them as zero
    * vectors. */
  def docEmbed(docs: DataFrame, dims: Int = DefaultDims): DataFrame =
    docEmbedSparse(docs, dims).orderBy("doc_id", "dim")

  /** The sort-free core — [[docEmbedVectors]] consumes this directly:
    * collect_list is order-sensitive, so building the dense form on
    * the PRESENTATION-sorted frame would pay a full range exchange +
    * sort of the sparse cells that the key-addressed map never needs. */
  private[queries] def docEmbedSparse(docs: DataFrame, dims: Int): DataFrame = {
    require(dims >= 2, s"dims must be >= 2, got $dims")
    // widenScan before the tokenize+explode+hash map (guide §2.5)
    graft.ops.ScaleOps.widenScan(docs, "doc_id")
      .select(col("doc_id"), explode(words(col("text"))).as("word"))
      .select(col("doc_id"), polyHash(col("word")).as("h"))
      .select(col("doc_id"),
        pmod(col("h"), lit(dims.toLong)).as("dim"),
        // `div` = integer division (matches DuckDB's `//` on the
        // non-negative hash; `/` would be a double division)
        (pmod(expr(s"h div $dims"), lit(2L)) * 2L - 1L).as("s"))
      .groupBy("doc_id", "dim")
      .agg(sum(col("s")).as("q"))
      .filter(col("q") =!= 0L)
  }

  /** The dense `(vec_id, embedding: array<float>)` form the E-family
    * consumes — integer components cast to float (exact for |q| <
    * 2^24; a word would need 16M+ occurrences in ONE doc to exceed
    * that). Every input doc appears, wordless docs as zero vectors. */
  def docEmbedVectors(docs: DataFrame, dims: Int = DefaultDims): DataFrame = {
    val sparse = docEmbedSparse(docs, dims)
      .groupBy("doc_id")
      .agg(map_from_entries(collect_list(struct(col("dim"), col("q")))).as("m"))
    docs.select(col("doc_id"))
      .join(sparse, Seq("doc_id"), "left")
      .select(col("doc_id").as("vec_id"),
        transform(sequence(lit(0L), lit(dims - 1L)),
          i => coalesce(element_at(col("m"), i), lit(0L)).cast("float"))
          .as("embedding"))
  }

  /** Oracle row at 16 dims (64 would hash-check just as exactly but
    * print 4× the rows for the same evidence). */
  private val OracleDims = 16

  /** The E9 sparse-embedding CTE chain over `tbl`, ending in
    * `esp (doc_id, dim, q)` — shared by the E9 row, the D15b
    * text-native SemDeDup row, and C22's trained quality model, so
    * the bridge cannot drift between its consumers. CTE names are
    * prefixed `e` to stay collision-free when chained into larger
    * oracles. */
  private[queries] def sqlDocEmbedSparseCtes(tbl: String, dims: Int): String =
    s"""ew AS (
        SELECT doc_id,
          unnest(list_filter(${sqlWords("text")}, t -> t <> '')) AS word
        FROM $tbl),
      eh AS (
        SELECT doc_id,
          (${sqlPolyHash("word")}) % $dims AS dim,
          ((${sqlPolyHash("word")}) // $dims) % 2 * 2 - 1 AS s
        FROM ew),
      esp AS (
        SELECT doc_id, CAST(dim AS BIGINT) AS dim, CAST(sum(s) AS BIGINT) AS q
        FROM eh GROUP BY doc_id, dim HAVING sum(s) <> 0)"""

  val qDocEmbed: Q = Q(
    "q_doc_embed",
    (s, d) => docEmbed(Tables.documents(s, d), OracleDims),
    Some(s"""WITH ${sqlDocEmbedSparseCtes("documents", OracleDims)}
      SELECT doc_id, dim, q FROM esp
      ORDER BY doc_id, dim"""))

  /** D15b: SemDeDup over the corpus's OWN hashed embeddings — the
    * fully TEXT-NATIVE semantic dedup: documents → E9 signed-hash
    * vectors → D15 cell-scoped near-dup decisions, one lazy plan, no
    * external model anywhere. The oracle chains the E9 CTEs into
    * [[Similarity.sqlSemanticDedupFrom]] (the same fragment the
    * embeddings-table row uses), so the bridge and the dedup can
    * never drift from their standalone rows — the D17/D18 composed-
    * oracle technique applied across the text/vector boundary.
    *
    * minCosine = 0.9 (the SemDeDup paper default) has real corpus
    * action here: bag-of-words vectors over the small synthetic
    * vocabulary put ~15% of within-cell pairs above it. Every doc on
    * this corpus hashes to a nonzero vector (verified at all 3 SFs);
    * zero vectors in caller corpora degrade per [[Similarity
    * .semanticDedup]]'s nanvl sentinel. */
  val qDedupSemanticText: Q = Q(
    "q_dedup_semantic_text",
    (s, d) => Similarity.semanticDedup(
      docEmbedVectors(Tables.documents(s, d), OracleDims),
      cells = 10, minCosine = 0.9),
    Some {
      val (semCtes, semSelect) =
        Similarity.sqlSemanticDedupFrom("vecs", 10, 0.9)
      s"""WITH ${sqlDocEmbedSparseCtes("documents", OracleDims)},
      mm AS (
        SELECT doc_id,
          map_from_entries(list(struct_pack(k := dim, v := q))) AS m
        FROM esp GROUP BY doc_id),
      vecs AS (
        SELECT d.doc_id AS vec_id,
          list_transform(range(0, $OracleDims),
            i -> CAST(coalesce(map_extract(m, i)[1], 0) AS DOUBLE)) AS embedding
        FROM documents d LEFT JOIN mm ON d.doc_id = mm.doc_id),
      $semCtes
      $semSelect"""
    })

  val all: Seq[Q] = Seq(qDocEmbed, qDedupSemanticText)
}
