package graft.queries

import graft.{Q, Tables}
import graft.functions.VectorFunctions.{sqlDot, sqlNorm2}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding quantization (SURVEY.md §2 E6) — per-dimension int8
  * min/max scaling, the memory-reduction pass that makes a 100 TB
  * vector corpus ANN-searchable (4× smaller than float32, SIMD-friendly
  * distance kernels downstream; the IVF/LSH stages E2/E3 run unchanged
  * on the codes).
  *
  * code = round((v − lo_d) · 254 / (hi_d − lo_d)) − 127 ∈ [−127, 127],
  * where (lo_d, hi_d) are the corpus-wide per-dimension extrema.
  * Determinism: float→double widening is exact, the scalar expression
  * is a fixed operation sequence (not an aggregate), and Spark's
  * HALF_UP `round` matches DuckDB's — so the integer codes are
  * bit-identical cross-engine. Constant dimensions (hi = lo) code to 0.
  *
  * Scale shape: one posexplode → per-dimension min/max agg (64 rows —
  * map-side combinable, broadcast back), then a pure map stage. The
  * join key is `dim`, a 64-value broadcast — the corpus never shuffles.
  */
object Quantize {

  /** Memo for [[annIvfSq8]]'s assignment frame (vec_id, cell, c_emb,
    * res) — read TWICE per call (eagerly by the residual-extrema fit,
    * lazily by the returned search plan), and the N×cells argmax
    * window behind it is the operator's dominant cost: without the
    * memo every call paid that pass twice (a round-13 review finding).
    * LRU capacity 4; released by [[graft.ops.Release.sweep]]. */
  private[this] val asgCache = new graft.ops.PlanCache(capacity = 4)

  /** The int8 code formula — ONE definition shared by the long-format
    * E6 row and the E16 index build, so the stored-code contract
    * cannot drift between them. */
  private def sq8Code(v: Column, lo: Column, hi: Column): Column =
    when(hi === lo, 0L)
      .otherwise((round((v.cast("double") - lo) * 254 / (hi - lo)) - 127)
        .cast("long"))

  /** Midpoint dequantization of [[sq8Code]]: the reconstruction the
    * asymmetric-distance search scores against. */
  private def sq8Deq(c: Column, lo: Column, hi: Column): Column =
    lo + (c.cast("double") + 127) * (hi - lo) / 254

  /** Long-format int8 codes of an (vec_id, embedding: array<float>)
    * frame: (vec_id, dim, code). */
  def quantizeInt8(embeddings: DataFrame): DataFrame = {
    val ex = embeddings.select(col("vec_id"),
      posexplode(col("embedding")).as(Seq("dim", "v")))
    val stats = ex.groupBy("dim").agg(
      min(col("v").cast("double")).as("lo"),
      max(col("v").cast("double")).as("hi"))
    ex.join(broadcast(stats), "dim")
      .select(col("vec_id"), col("dim").cast("long").as("dim"),
        sq8Code(col("v"), col("lo"), col("hi")).as("code"))
      .orderBy("vec_id", "dim")
  }

  val qEmbedQuantize: Q = Q(
    "q_embed_quantize",
    (s, d) => quantizeInt8(Tables.embeddings(s, d)),
    Some("""WITH ex AS (
        SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
          unnest(embedding)::DOUBLE AS v
        FROM embeddings),
      stats AS (
        SELECT dim, min(v) AS lo, max(v) AS hi FROM ex GROUP BY dim)
      SELECT vec_id, CAST(dim AS BIGINT) AS dim,
        CAST(CASE WHEN hi = lo THEN 0
          ELSE round((v - lo) * 254 / (hi - lo)) - 127 END AS BIGINT) AS code
      FROM ex JOIN stats USING (dim)
      ORDER BY vec_id, dim"""))

  // ----------------------------------------------------------------
  // E16 — SQ8 ANN: search ON the int8 codes, exact rescore
  // ----------------------------------------------------------------

  /** ANN over the SQ8-quantized index (Faiss `ScalarQuantizer` flat
    * search) — the row that actually SEARCHES E6's codes, closing the
    * loop E6 opens ("the 4× cut that makes the corpus searchable"):
    * the candidate scan reads 1-byte codes, not floats, so at 100 TB
    * the scan is 4× cheaper in IO/cache before any structure (IVF)
    * is added on top.
    *
    *   - fit: per-dimension extrema (dims rows, map-side combinable);
    *     the finished lo/hi arrays are driver model state (2×dims
    *     doubles, shipped back as plan literals — the E13 contract);
    *   - index: per vector `codes array<tinyint-valued long>` — one
    *     shuffle-free map via the SAME [[sq8Code]] formula as E6;
    *   - search (asymmetric, ADC): approx score = q · deq(codes) /
    *     ‖deq(codes)‖ — cosine up to the per-query constant 1/‖q‖, so
    *     the shortlist cut is norm-invariant — with midpoint
    *     dequantization computed INSIDE the scan projection
    *     (the stored artifact is codes + the 2×dims model, never
    *     reconstructed floats), per-query `shortlist` survivors by
    *     (approx DESC, vec_id), then the EXACT cosine rescore on
    *     original embeddings ranks the final top-k — approximation
    *     orders candidates, never scores output.
    *
    * `shortlist >= corpus` is provably exhaustive: every vector
    * survives the cut and the exact rescore ranks everything — output
    * ≡ brute-force top-k whatever the codes did (the E7/E3b
    * losslessness pattern; the driver row runs this configuration
    * against the brute-force SQL). Production recall at shortlist=50
    * is gated in QuantizeSpec. */
  def annSq8(embeddings: DataFrame, shortlist: Int = 50): DataFrame = {
    require(shortlist >= 1, s"shortlist must be >= 1, got $shortlist")
    val stats = embeddings
      .select(posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("dim").agg(
        min(col("v").cast("double")).as("lo"),
        max(col("v").cast("double")).as("hi"))
      .orderBy("dim").collect()
    val loL = lit(stats.map(_.getDouble(1)))
    val hiL = lit(stats.map(_.getDouble(2)))
    def loAt(i: Column) = element_at(loL, i.cast("int") + 1)
    def hiAt(i: Column) = element_at(hiL, i.cast("int") + 1)
    import graft.functions.NativeExpressions.dot
    // the stored artifact is the code array; the ADC target is its
    // midpoint dequantization, projected HERE — once per vector in the
    // index scan, not once per (query, vector) pair above the join.
    // deq_n2 rides the same projection: the final metric is COSINE, so
    // the shortlist must rank by adc/‖deq‖ — a raw dot(q, deq) cut
    // favors large-norm index vectors and silently degrades recall on
    // norm-skewed corpora (a round-12 advisor finding); dividing by
    // the reconstruction's norm costs one fused multiply per dim in
    // the scan and makes the cut norm-invariant
    val idx = embeddings.select(col("vec_id"),
      transform(
        transform(col("embedding"), (v, i) => sq8Code(v, loAt(i), hiAt(i))),
        (c, i) => sq8Deq(c, loAt(i), hiAt(i))).as("deq"))
      .withColumn("deq_n2",
        aggregate(col("deq"), lit(0.0), (acc, x) => acc + x * x))
    val v = Similarity.withNorms(embeddings)
    val q = Similarity.queries(v)
    val byAdc = Window.partitionBy(col("q_id"))
      .orderBy(col("adc").desc, col("vec_id"))
    val cand = q.join(idx, col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("q_emb"), col("q_n2"), col("vec_id"),
        // cosine up to the constant 1/‖q‖ (rank-invariant per query);
        // all-zero reconstructions (deq_n2 = 0) score 0, never NaN
        when(col("deq_n2") === 0.0, lit(0.0))
          .otherwise(dot(col("q_emb"), col("deq")) / sqrt(col("deq_n2")))
          .as("adc"))
      .withColumn("rn", row_number().over(byAdc))
      .filter(col("rn") <= shortlist)
    val rescored = cand
      .join(v, Seq("vec_id"))
      .select(col("q_id"), col("vec_id"),
        (dot(col("q_emb"), col("embedding")) /
          (sqrt(col("q_n2")) * sqrt(col("n2")))).as("cos"))
    Similarity.topkPerQuery(rescored)
  }

  /** E16's oracle row: the exhaustive configuration (shortlist covers
    * any corpus this row sees) — codes, ADC, shortlist, and rescore
    * all execute, and the output must equal brute-force top-k. */
  val qAnnSq8: Q = Q(
    "q_ann_sq8",
    (s, d) => annSq8(Tables.embeddings(s, d), shortlist = Int.MaxValue),
    Some(Similarity.bruteforceSql))

  // ----------------------------------------------------------------
  // E17 — IVF over SQ8-coded residuals (Faiss IndexIVFScalarQuantizer)
  // ----------------------------------------------------------------

  /** ANN over IVF cells whose members are stored as SQ8-coded
    * RESIDUALS — the Faiss `IVF,SQ8` production layout (by_residual):
    * E16 scans the whole flat code table per query; here a probed
    * search touches only `probes` cells' codes, so the 4× SQ8 IO cut
    * applies INSIDE an N/cells-sized candidate set instead of a full
    * scan — the index shape for corpora where even a 1-byte/dim flat
    * scan is too much IO.
    *
    *   - coarse index: deterministic first-`cells` centroids with
    *     cosine-argmax assignment (the E3 rule — shared convention, so
    *     the exhaustive configuration is replayable against the same
    *     brute-force SQL);
    *   - fit: per-dimension extrema of the RESIDUAL r = v − c(v) (2×
    *     dims doubles of driver model state; residuals concentrate
    *     near 0, so the same 8 bits buy finer resolution than raw-
    *     vector coding — the reason production IVF-SQ codes
    *     residuals). Eager: this call runs the assignment + extrema
    *     jobs before returning (the E16 contract);
    *   - index: per vector (cell, recon) where recon = c(v) +
    *     deq(codes) is the midpoint reconstruction, projected once in
    *     the index scan with its norm (the stored artifact is cell +
    *     m 1-byte codes; recon is scan-local arithmetic, never a
    *     materialized float column);
    *   - search: probe the `probes` nearest cells by centroid cosine,
    *     rank candidates by dot(q, recon)/‖recon‖ (norm-invariant,
    *     the E16 advisory lesson), keep `shortlist` per query, exact-
    *     rescore on originals.
    *
    * `probes = cells` with an untruncated shortlist is provably
    * exhaustive (every vector sits in exactly one cell and survives
    * the cut; the exact rescore ranks everything) — output ≡ brute
    * force whatever the codes did, which is the driver row's
    * configuration. Production recall at probes=3/shortlist=50 is
    * gated in QuantizeSpec. */
  def annIvfSq8(
      embeddings: DataFrame,
      cells: Int = 10,
      probes: Int = 3,
      shortlist: Int = 50): DataFrame = {
    require(cells >= 1, s"cells must be >= 1, got $cells")
    require(probes >= 1, s"probes must be >= 1, got $probes")
    require(shortlist >= 1, s"shortlist must be >= 1, got $shortlist")
    import graft.functions.NativeExpressions.dot
    val v = Similarity.withNorms(embeddings)
    val cents = v.filter(col("vec_id") < cells)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
        col("n2").as("c_n2"))
    val byVec = Window.partitionBy(col("vec_id"))
      .orderBy(col("c_cos").desc, col("c_id"))
    val assigned = asgCache.memo(v.join(broadcast(cents), lit(true))
      .withColumn("c_cos",
        dot(col("embedding"), col("c_emb")) /
          (sqrt(col("n2")) * sqrt(col("c_n2"))))
      .withColumn("rn", row_number().over(byVec))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("c_id").as("cell"), col("c_emb"),
        zip_with(col("embedding"), col("c_emb"),
          (x, c) => x.cast("double") - c.cast("double")).as("res")))
    val stats = assigned
      .select(posexplode(col("res")).as(Seq("dim", "r")))
      .groupBy("dim").agg(min(col("r")).as("lo"), max(col("r")).as("hi"))
      .orderBy("dim").collect()
    val loL = lit(stats.map(_.getDouble(1)))
    val hiL = lit(stats.map(_.getDouble(2)))
    def loAt(i: Column) = element_at(loL, i.cast("int") + 1)
    def hiAt(i: Column) = element_at(hiL, i.cast("int") + 1)
    // reconstruction = centroid + dequantized residual, with its norm,
    // all inside the index-scan projection (once per vector)
    val idx = assigned.select(col("vec_id"), col("cell"),
        transform(col("res"), (r, i) =>
          sq8Deq(sq8Code(r, loAt(i), hiAt(i)), loAt(i), hiAt(i)) +
            element_at(col("c_emb"), i.cast("int") + 1).cast("double"))
          .as("recon"))
      .withColumn("recon_n2",
        aggregate(col("recon"), lit(0.0), (acc, x) => acc + x * x))
    val q = Similarity.queries(v)
    val byQc = Window.partitionBy(col("q_id"))
      .orderBy(col("c_cos").desc, col("c_id"))
    val probed = q.join(broadcast(cents), lit(true))
      .withColumn("c_cos",
        dot(col("q_emb"), col("c_emb")) /
          (sqrt(col("q_n2")) * sqrt(col("c_n2"))))
      .withColumn("rn", row_number().over(byQc))
      .filter(col("rn") <= probes)
      .select(col("q_id"), col("q_emb"), col("q_n2"), col("c_id").as("cell"))
    val byAdc = Window.partitionBy(col("q_id"))
      .orderBy(col("adc").desc, col("vec_id"))
    val cand = probed.join(idx, Seq("cell"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("q_emb"), col("q_n2"), col("vec_id"),
        when(col("recon_n2") === 0.0, lit(0.0))
          .otherwise(dot(col("q_emb"), col("recon")) / sqrt(col("recon_n2")))
          .as("adc"))
      .withColumn("rn", row_number().over(byAdc))
      .filter(col("rn") <= shortlist)
    val rescored = cand
      .join(v, Seq("vec_id"))
      .select(col("q_id"), col("vec_id"),
        (dot(col("q_emb"), col("embedding")) /
          (sqrt(col("q_n2")) * sqrt(col("n2")))).as("cos"))
    Similarity.topkPerQuery(rescored)
  }

  /** E17's oracle row — the E7/E3b losslessness pattern: probes =
    * cells and an untruncated shortlist make the whole IVF-SQ8 path
    * (assignment, residual fit, codes, reconstruction-cosine cut,
    * rescore) execute while the output provably equals brute-force
    * top-k. */
  val qAnnIvfSq8: Q = Q(
    "q_ann_ivf_sq8",
    (s, d) => annIvfSq8(Tables.embeddings(s, d), cells = 10, probes = 10,
      shortlist = Int.MaxValue),
    Some(Similarity.bruteforceSql))

  /** E17b — the PRODUCTION-SETTINGS search row (probes = 3 of 10
    * cells, shortlist = 50), the E7-search analogue for IVF-SQ8: the
    * r14 verdict's ask #5. Unlike E7/E15 no KMeans is involved —
    * first-k centroids and the residual extrema are both
    * SQL-derivable aggregates — so the ORACLE REPLAYS THE WHOLE
    * APPROXIMATE SEARCH with no stash literals at all: assignment
    * argmax, per-dim residual lo/hi, the int8 code+dequant round trip
    * (Spark HALF_UP round == DuckDB round, the E6 precedent), the
    * norm-invariant reconstruction-cosine shortlist cut, and the
    * exact rescore, every double the same strict-fold IEEE chain.
    * Approximate search, exactly replayed — a stronger statement than
    * the stash rows, since even the fit is re-derived. Production
    * recall floors stay gated in QuantizeSpec. */
  val qAnnIvfSq8Search: Q = Q(
    "q_ann_ivf_sq8_search",
    (s, d) => annIvfSq8(Tables.embeddings(s, d), cells = 10, probes = 3,
      shortlist = 50),
    Some(s"""WITH v AS (SELECT vec_id, embedding,
        ${sqlNorm2("embedding")} AS n2 FROM embeddings),
      c AS (SELECT vec_id AS c_id, embedding AS c_emb, n2 AS c_n2
        FROM v WHERE vec_id < 10),
      asg AS (SELECT vec_id, embedding, n2, c_id AS cell, c_emb FROM (
          SELECT v.vec_id, v.embedding, v.n2, c.c_id, c.c_emb,
            row_number() OVER (PARTITION BY v.vec_id ORDER BY
              (${sqlDot("v.embedding", "c.c_emb")} /
                (sqrt(v.n2) * sqrt(c.c_n2))) DESC,
              c.c_id ASC) AS rn
          FROM v CROSS JOIN c) t WHERE rn = 1),
      res AS (SELECT vec_id, cell, c_emb,
          list_transform(range(1, len(embedding) + 1),
            i -> embedding[i]::DOUBLE - c_emb[i]::DOUBLE) AS r
        FROM asg),
      st AS (SELECT dim, min(x) AS lo, max(x) AS hi FROM (
          SELECT generate_subscripts(r, 1) AS dim, unnest(r) AS x
          FROM res) z GROUP BY dim),
      stat AS (SELECT list(lo ORDER BY dim) AS los,
          list(hi ORDER BY dim) AS his FROM st),
      idx AS (SELECT vec_id, cell, recon,
          list_reduce(list_prepend(0.0::DOUBLE,
            list_transform(recon, x -> x * x)), (a, b) -> a + b) AS recon_n2
        FROM (SELECT res.vec_id, res.cell,
            list_transform(range(1, len(r) + 1), i ->
              los[i] + ((CASE WHEN his[i] = los[i] THEN 0
                  ELSE CAST(round((r[i] - los[i]) * 254 / (his[i] - los[i]))
                    AS BIGINT) - 127 END) + 127)
                * (his[i] - los[i]) / 254
                + c_emb[i]::DOUBLE) AS recon
          FROM res CROSS JOIN stat) z2),
      q AS (SELECT vec_id AS q_id, embedding AS q_emb, n2 AS q_n2
        FROM v WHERE vec_id % 100 = 0),
      probed AS (SELECT q_id, q_emb, q_n2, cell FROM (
          SELECT q.q_id, q.q_emb, q.q_n2, c.c_id AS cell,
            row_number() OVER (PARTITION BY q.q_id ORDER BY
              (${sqlDot("q.q_emb", "c.c_emb")} /
                (sqrt(q.q_n2) * sqrt(c.c_n2))) DESC,
              c.c_id ASC) AS rn
          FROM q CROSS JOIN c) t WHERE rn <= 3),
      cand AS (SELECT q_id, vec_id FROM (
          SELECT p.q_id, i.vec_id,
            row_number() OVER (PARTITION BY p.q_id ORDER BY
              (CASE WHEN i.recon_n2 = 0 THEN 0.0::DOUBLE
                ELSE ${sqlDot("p.q_emb", "i.recon")} / sqrt(i.recon_n2) END)
                DESC,
              i.vec_id ASC) AS rn
          FROM probed p JOIN idx i ON p.cell = i.cell
          WHERE p.q_id <> i.vec_id) t WHERE rn <= 50),
      scored AS (SELECT s.q_id, s.vec_id,
          ${sqlDot("q.q_emb", "v.embedding")} /
            (sqrt(q.q_n2) * sqrt(v.n2)) AS cos
        FROM cand s JOIN v ON s.vec_id = v.vec_id
        JOIN q ON s.q_id = q.q_id),
      ranked AS (SELECT q_id, vec_id, cos,
          row_number() OVER (PARTITION BY q_id
            ORDER BY cos DESC, vec_id) AS rank
        FROM scored)
      SELECT q_id, CAST(rank AS BIGINT) AS rank, vec_id AS neighbor_id, cos
      FROM ranked WHERE rank <= 5 ORDER BY q_id, rank"""))

  val all: Seq[Q] = Seq(qEmbedQuantize, qAnnSq8, qAnnIvfSq8, qAnnIvfSq8Search)
}
