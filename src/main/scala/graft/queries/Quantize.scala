package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
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
        when(col("hi") === col("lo"), 0L)
          .otherwise((round(
            (col("v").cast("double") - col("lo")) * 254 / (col("hi") - col("lo")))
            - 127).cast("long")).as("code"))
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

  val all: Seq[Q] = Seq(qEmbedQuantize)
}
