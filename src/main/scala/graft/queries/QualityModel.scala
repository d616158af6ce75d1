package graft.queries

import graft.{Q, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality filter (SURVEY.md §2 C11) — the fastText-style
  * hashed-feature linear classifier pass of an LLM data pipeline
  * (GPT-3's LR quality filter, CCNet's fastText scorer): tokens hash
  * into a fixed-width feature space, each bucket carries a weight, a
  * document's score is its mean token weight, and the keep flag
  * thresholds the score.
  *
  * The weight VECTOR here is synthesized deterministically from the
  * bucket index (an LCG over the bucket id) because the container has
  * no trained model — in production the `weight(b)` closed form is
  * replaced by a broadcast `Array[Float]` lookup of the trained
  * coefficients, and nothing else in the plan changes. What this row
  * actually exercises is the 100 TB-relevant plumbing: hashing
  * (feature extraction), per-token weight lookup, and per-doc
  * accumulation as ONE shuffle-free codegen'd map stage over the scan.
  *
  * Determinism contract: weights are INTEGERS in [-2^19, 2^19) and the
  * per-doc accumulator is a BIGINT sum — order-independent and exact,
  * so retries/speculation can't flip a score, and the single double
  * division at output is bit-identical across engines (same reasoning
  * as q_embed_centroids' fixed-point aggregation). No overflow: |token
  * weight| < 2^19 and a doc needs > 2^44 tokens to reach 2^63.
  */
object QualityModel {

  /** Hashed feature-space width (fastText uses 1e6–1e7 buckets; 4096
    * keeps the synthetic vocab collision-rich enough to exercise the
    * bucket path). */
  val Dim = 4096
  /** Weight scale: weights live in [-Half, Half). */
  private val Half = 524288L // 2^19
  private val A = 2654435761L // Knuth multiplicative LCG
  private val C = 40503L

  /** Integer weight of one token's feature bucket. */
  private def weight(tok: Column): Column =
    ((polyHash(tok) % Dim) * A + C) % (2 * Half) - Half

  /** Score any (doc_id, text) frame: (doc_id, n_tokens, model_score,
    * keep) with model_score = mean bucket weight / Half in [-1, 1). */
  def modelQuality(docs: DataFrame): DataFrame = {
    val raw = aggregate(
      transform(words(col("text")), weight(_)),
      lit(0L), (acc, x) => acc + x)
    docs
      .select(col("doc_id"),
        size(words(col("text"))).cast("long").as("n_tokens"),
        raw.as("raw"))
      .select(col("doc_id"), col("n_tokens"),
        when(col("n_tokens") > 0,
          col("raw").cast("double") / (col("n_tokens") * Half))
          .otherwise(lit(0.0)).as("model_score"),
        when(col("n_tokens") > 0 && col("raw") > 0, 1L).otherwise(0L)
          .as("keep"))
      .orderBy("doc_id")
  }

  val qQualityModel: Q = Q(
    "q_quality_model",
    (s, d) => modelQuality(Tables.documents(s, d)),
    Some(s"""WITH toks AS (
        SELECT doc_id, list_filter(${sqlWords("text")}, t -> t <> '') AS w
        FROM documents),
      sc AS (
        SELECT doc_id, len(w) AS n_tokens,
          coalesce(list_sum(list_transform(w,
            t -> ((${sqlPolyHash("t")} % $Dim) * $A + $C) % ${2 * Half} - $Half)), 0) AS raw
        FROM toks)
      SELECT doc_id,
        CAST(n_tokens AS BIGINT) AS n_tokens,
        CASE WHEN n_tokens > 0
          THEN CAST(raw AS DOUBLE) / (n_tokens * $Half)
          ELSE 0.0::DOUBLE END AS model_score,
        CAST(CASE WHEN n_tokens > 0 AND raw > 0 THEN 1 ELSE 0 END AS BIGINT) AS keep
      FROM sc ORDER BY doc_id"""))

  val all: Seq[Q] = Seq(qQualityModel)
}
