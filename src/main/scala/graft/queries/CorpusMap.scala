package graft.queries

import graft.{Q, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** I12 — corpus map: the data-cartography census (the Nomic-Atlas /
  * "know your corpus before you mix it" report) — every doc placed in
  * a CONTENT cell × QUALITY decile grid:
  *
  *   content cell = E14's oracle-exact Lloyd k-means over the corpus's
  *   OWN E9 signed-hash embeddings (unit-normalized — see below), so
  *   cells group docs by vocabulary, with no external model anywhere;
  *   quality decile = C15's corpus-relative decile paint.
  *
  * Output: (cell, decile, n_docs, n_tokens) — the two-axis census a
  * mix designer reads to see WHERE the token mass sits (is the
  * low-quality mass concentrated in one content cluster — excise it —
  * or smeared everywhere — reweight instead), and the denominator
  * frame for H6-style per-cell mixing.
  *
  * Pure composition of oracle-checked machinery (the D17/D18
  * discipline — every stage reuses the standalone row's own fragment,
  * so composition cannot drift): E9's sparse-embedding CTEs →
  * unit-normalized DOUBLE vectors → E14's chained-CTE Lloyd replay
  * (the SAME sqlKmeansCtes fragment, k=8, 2 iterations) → C15's
  * decile CTEs → one integer cross-tab. The whole trained pipeline —
  * embedding, EVERY k-means iteration, assignment, decile thresholds,
  * census — hashes against DuckDB in one row.
  *
  * Unit normalization is load-bearing twice: (a) k-means on raw
  * bag-of-words vectors clusters by document LENGTH (norm dominates
  * distance — the standard tf vs tf-direction mistake); (b) it bounds
  * d2 ≤ 4, inside the E14 packed-argmin's 2^41 quantization domain,
  * where raw counts would overflow it. The vectors stay DOUBLE from
  * the exact integer q's (never float — a float round-trip would
  * diverge from DuckDB's double chain); zero vectors (wordless docs)
  * stay zero and assign deterministically like any other point.
  *
  * Scale shape: E9's one explode + (doc, dim) agg; 2 Lloyd passes
  * (broadcast centroids, packed argmin — nothing shuffles but
  * (vec_id, cell)); C15's bounded-histogram decile paint; one
  * map-side-combinable cross-tab on ≤ k×10 keys. At 100 TB: fit the
  * cells on a sample and assign the full corpus — `fitFraction` < 1
  * threads to [[KMeansLloyd.assignments]], which runs the whole Lloyd
  * fit on the seeded draw and then assigns EVERY doc once under the
  * final centroids — the census itself never moves text.
  */
object CorpusMap {

  /** Census defaults, shared with the oracle so they cannot drift. */
  val MapDims = 16
  val MapCells = 8
  val MapIters = 2

  /** The per-doc grid frame feeds multiple consumers — the census
    * aggregate, the mixer's stats AND its final join (H15's plan reads
    * it twice) — so memo the placement pass per (corpus, params) plan:
    * without it the broadcast-argmin assignment and token count re-scan
    * the corpus once per consumer subtree. */
  private[this] val cellCache = new graft.ops.PlanCache(capacity = 2)

  /** Unit-normalized DOUBLE doc vectors from E9's sparse embedding —
    * (vec_id, embedding array<double>); wordless docs are zero
    * vectors (normalization guarded). */
  private[graft] def unitDocVectors(docs: DataFrame, dims: Int): DataFrame = {
    val sparse = DocEmbed.docEmbedSparse(docs, dims)
      .groupBy("doc_id")
      .agg(map_from_entries(collect_list(struct(col("dim"), col("q")))).as("m"))
    val raw = docs.select(col("doc_id"))
      .join(sparse, Seq("doc_id"), "left")
      .select(col("doc_id").as("vec_id"),
        transform(sequence(lit(0L), lit(dims - 1L)),
          i => coalesce(element_at(col("m"), i), lit(0L)).cast("double"))
          .as("raw"))
    raw.select(col("vec_id"),
      aggregate(col("raw"), lit(0.0), (acc, x) => acc + x * x).as("n2"),
      col("raw"))
      .select(col("vec_id"),
        when(col("n2") === 0.0, col("raw"))
          .otherwise(transform(col("raw"), x => x / sqrt(col("n2"))))
          .as("embedding"))
  }

  /** Per-doc placement on the corpus-map grid:
    * (doc_id, cell, decile, n_tokens) — the shared frame BOTH the
    * census ([[corpusMap]]) and the per-cell mixer ([[cellMix]])
    * aggregate, so the two cannot drift (the D17 one-fragment
    * discipline; [[sqlDocCellCtes]] is its oracle mirror). */
  private[graft] def docCells(
      docs: DataFrame,
      dims: Int = MapDims,
      cells: Int = MapCells,
      iters: Int = MapIters,
      fitFraction: Double = 1.0): DataFrame =
    // Full-fit placement runs as the FROZEN-path pure per-row map under
    // the fitted state (fit once, then one shuffle-free map — no decile
    // or token join, no per-consumer re-aggregation): CorpusMapSpec
    // pins [[assignFrozen]](docs, fitModel(docs)) bit-equal to the
    // joined construction, and the I12/H15 oracles hash the result
    // against the full CTE replay. The joined path remains for sample
    // fits (fitModel freezes cents_{iters-1}; the sample-fit
    // [[KMeansLloyd.assignments]] convention assigns under cents_iters,
    // so the two are NOT interchangeable there) and as the spec's
    // differential twin.
    cellCache.memo(
      if (fitFraction >= 1.0)
        assignFrozen(docs, fitModel(docs, dims, cells, iters))
      else docCellsJoined(docs, dims, cells, iters, fitFraction))

  /** The fitted-frame JOINED construction of the per-doc grid —
    * assignment frame ⨝ deciles ⨝ token counts. [[docCells]]' sample-fit
    * path, and CorpusMapSpec's differential twin for the frozen map. */
  private[graft] def docCellsJoined(
      docs: DataFrame,
      dims: Int = MapDims,
      cells: Int = MapCells,
      iters: Int = MapIters,
      fitFraction: Double = 1.0): DataFrame = {
    val assigned = KMeansLloyd.assignments(
      unitDocVectors(docs, dims), k = cells, iters = iters,
      fitFraction = fitFraction)
      .select(col("vec_id").as("doc_id"), col("cell"))
    val deciles = TextAnalysis.qualityDeciles(docs)
      .select(col("doc_id"), col("decile"))
    val toks = docs.select(col("doc_id"),
      size(words(col("text"))).cast("long").as("n_tokens"))
    assigned.join(deciles, "doc_id").join(toks, "doc_id")
      .select(col("doc_id"), col("cell"), col("decile"), col("n_tokens"))
  }

  /** The corpus-map census: (cell, decile, n_docs, n_tokens).
    * `fitFraction` < 1 = the 100 TB fit path (sample-fit Lloyd, full
    * assign — see the class doc); the oracle row runs the full fit. */
  def corpusMap(
      docs: DataFrame,
      dims: Int = MapDims,
      cells: Int = MapCells,
      iters: Int = MapIters,
      fitFraction: Double = 1.0): DataFrame =
    docCells(docs, dims, cells, iters, fitFraction)
      .groupBy("cell", "decile")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
      .orderBy("cell", "decile")

  /** FROZEN corpus-map state — the bounded model literals (k×dims
    * centroid doubles + 9 decile cuts) a STATELESS assignment carries
    * onto arriving docs: the G22 stream form and any serving path that
    * must not refit. `centroids` are the ones the census's last
    * assignment used (cents_{iters-1}), so
    * `assignFrozen(docs, fitModel(docs))` equals [[docCells]](docs)
    * EXACTLY at the default full fit — the spec-pinned twin. */
  final case class CorpusMapModel(
      centroids: Seq[(Long, Array[Double])],
      cuts: Seq[Long],
      dims: Int)

  /** Fit the frozen state on a corpus (one Lloyd fit + one decile
    * histogram pass; `fitFraction` < 1 runs the Lloyd fit on the
    * seeded draw). Eager: the fit runs at call time. */
  def fitModel(
      docs: DataFrame,
      dims: Int = MapDims,
      cells: Int = MapCells,
      iters: Int = MapIters,
      fitFraction: Double = 1.0): CorpusMapModel =
    CorpusMapModel(
      KMeansLloyd.assignCentroids(unitDocVectors(docs, dims), cells, iters,
        fitFraction),
      TextAnalysis.decileCuts(docs), dims)

  /** Per-doc grid placement under FROZEN state — (doc_id, cell,
    * decile, n_tokens) as a PURE PER-ROW MAP: the embedding is the
    * E9 signed-hash sum folded column-side (no explode/agg), the cell
    * is [[KMeansLloyd.packedMin]] over centroid literals (no join),
    * the decile compares q_units against the frozen cuts. No shuffle,
    * no state — a streaming plan hosts it as-is (the G9/G12 stateless
    * argument; [[graft.streaming.Streams.corpusMapStream]] is the thin
    * wrapper), and at 100 TB the whole assignment is one map stage in
    * the scan projection. Every column replays the fitted path's
    * arithmetic exactly (shared fragments: [[TextAnalysis.qNumDenCols]],
    * packedMin's packedDistCol) — CorpusMapSpec pins bit-equality with
    * [[docCells]] under a same-corpus fit. */
  def assignFrozen(docs: DataFrame, model: CorpusMapModel): DataFrame = {
    require(model.cuts.length == 9, "model must carry 9 decile cuts")
    val dims = model.dims
    val ws = coalesce(words(col("text")), array().cast("array<string>"))
    // the E9 signed-hash sum per dim, column-side: Σ over words of
    // ±1 at dim h mod d — the docEmbedSparse math with the explode
    // folded into an aggregate (same integers, so same doubles)
    val raw = transform(sequence(lit(0L), lit(dims - 1L)), d =>
      aggregate(ws, lit(0L), (acc, w) => {
        val h = polyHash(w)
        val hdiv = ((h - pmod(h, lit(dims.toLong))) / lit(dims.toLong))
          .cast("long") // exact: h < 2^31, double division of exact ints
        val s = pmod(hdiv, lit(2L)) * 2L - 1L
        acc + when(pmod(h, lit(dims.toLong)) === d, s).otherwise(0L)
      }).cast("double"))
    val (num, den) = TextAnalysis.qNumDenCols
    val cuts = model.cuts.zipWithIndex.map { case (c, _) =>
      when(col("q_units") > lit(c), 1L).otherwise(0L) }
    docs
      .withColumn("raw", raw)
      .withColumn("n2",
        aggregate(col("raw"), lit(0.0), (acc, x) => acc + x * x))
      .withColumn("embedding",
        when(col("n2") === 0.0, col("raw"))
          .otherwise(transform(col("raw"), x => x / sqrt(col("n2")))))
      .withColumn("cell",
        KMeansLloyd.packedMin(col("embedding"), model.centroids))
      .withColumn("q_num", num).withColumn("q_den", den)
      .withColumn("q_units", expr("q_num * 16384L div q_den"))
      .withColumn("decile", cuts.foldLeft(lit(1L))(_ + _))
      .select(col("doc_id"), col("cell"), col("decile"),
        size(words(col("text"))).cast("long").as("n_tokens"))
  }

  /** The oracle mirror of [[docCells]]: every I12 CTE (E9 sparse
    * embedding → unit vectors → Lloyd replay → deciles → token
    * counts) ending in `doc_cells (doc_id, cell, decile, n_tokens)` —
    * the census row and the cell-mix row both select from it, so the
    * two oracles replay the SAME trained pipeline by construction. */
  private[graft] def sqlDocCellCtes: String =
    s"""${DocEmbed.sqlDocEmbedSparseCtes("documents", MapDims)},
      mm AS (
        SELECT doc_id,
          map_from_entries(list(struct_pack(k := dim, v := q))) AS m
        FROM esp GROUP BY doc_id),
      vraw AS (
        SELECT d.doc_id AS vec_id,
          list_transform(range(0, $MapDims),
            i -> CAST(coalesce(map_extract(m, i)[1], 0) AS DOUBLE)) AS raw
        FROM documents d LEFT JOIN mm ON d.doc_id = mm.doc_id),
      v AS MATERIALIZED (
        SELECT vec_id,
          CASE WHEN n2 = 0.0 THEN raw
            ELSE list_transform(raw, x -> x / sqrt(n2)) END AS embedding
        FROM (SELECT vec_id, raw,
            list_reduce(list_prepend(0.0::DOUBLE,
              list_transform(raw, x -> x * x)), (a, b) -> a + b) AS n2
          FROM vraw) z),
      ${KMeansLloyd.sqlKmeansCtes(MapCells, MapIters)},
      ${TextAnalysis.sqlDecileCtes("documents")},
      tok AS (SELECT doc_id,
          CAST(len(list_filter(${sqlWords("text")}, t -> t <> '')) AS BIGINT) AS n
        FROM documents),
      doc_cells AS MATERIALIZED (
        SELECT a.vec_id AS doc_id, a.cell, dd.decile, t.n AS n_tokens
        FROM asg$MapIters a
        JOIN deciles dd ON a.vec_id = dd.doc_id
        JOIN tok t ON a.vec_id = t.doc_id)"""

  val qCorpusMap: Q = Q(
    "q_corpus_map",
    (s, d) => corpusMap(Tables.documents(s, d)),
    Some(s"""WITH $sqlDocCellCtes
      SELECT cell, decile,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n_tokens) AS BIGINT) AS n_tokens
      FROM doc_cells
      GROUP BY 1, 2
      ORDER BY 1, 2"""))

  val all: Seq[Q] = Seq(qCorpusMap, CellMix.qCellMix, CellMix.qCellMixQuality)
}
