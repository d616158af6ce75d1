package graft.queries

import graft.Q
import graft.Tables
import graft.ops.Checkpoints
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** C22 — TRAIN the quality filter on-cluster: distill the C16 rule
  * gate into a linear model over E9 hashed features by batch
  * perceptron, every step exact integer arithmetic, the whole
  * trajectory oracle-replayed.
  *
  * The production pattern (CCNet, fastText quality filters, the
  * GPT-3/LLaMA "looks-like-Wikipedia" classifiers): hand heuristics
  * label a seed set, a cheap linear model learns them, and the MODEL
  * — one dot product per doc — becomes the corpus-scale gate,
  * generalizing past the rules and scoring in one map pass. C11
  * (`q_quality_model`) is that gate with FROZEN weights; this row is
  * where the weights come from, with no external trainer and no RNG.
  *
  * Semantics: features = E9 signed-hash counts ([[DocEmbed
  * .docEmbedSparse]], sparse (doc_id, dim, q)) plus a constant bias
  * feature at dim = -1 (also guaranteeing every doc — wordless ones
  * included — at least one feature row); labels y = ±1 from the C16
  * Gopher gate at the oracle-row params. Batch perceptron, `iters`
  * fixed rounds: score_i = Σ w[dim]·q_i[dim]; every doc with
  * y_i·score_i <= 0 (zero-init round 1 = every doc) contributes
  * y_i·q_i to the weight delta. Output = the full training
  * TRAJECTORY: (iter, dim, w, n_mistakes) for every round — richer
  * hash evidence than final weights alone, and the convergence curve
  * (n_mistakes by round) is the quantity an operator actually
  * monitors.
  *
  * Determinism: integer sums are commutative, so the batch update is
  * partition-order-independent — unlike SGD, whose update order is a
  * shuffle artifact; this is the distributed-training-correctness
  * reason to prefer full-batch here. The oracle unrolls the loop as
  * chained CTEs (the D11 PageRank technique), reusing C16's counts
  * fragment + kept condition and E9's embedding fragment, so labels,
  * features, and training can none of them drift from their
  * standalone rows.
  *
  * Scale shape: the labeled feature frame (3 longs + y per nonzero
  * dim) is localCheckpoint'd once; each round is ONE action — score
  * agg on doc_id, mistake filter, per-dim update agg — collecting
  * exactly dims+1 longs to the driver (the model, which is
  * driver-held by definition; the corpus never moves). n_mistakes
  * rides the bias dimension's count in the same aggregation, so no
  * second job per round. 100 TB cost: iters × (two narrow shuffles),
  * with text touched only in the one feature/label extraction pass.
  */
object QualityTrain {

  val DefaultDims = 16
  val DefaultIters = 5

  /** The training labels: y = ±1 from the C16 gate at the oracle-row
    * params (minWords 10, corpus-bearing stop set). */
  private[graft] def gateLabels(docs: DataFrame): DataFrame =
    TextAnalysis
      .gopherFlagsRetain(docs, minWords = 10L, maxWords = 100000L,
        stops = TextAnalysis.CorpusStops)
      .select(col("doc_id"), (col("kept") * 2L - 1L).as("y"))

  /** Labeled sparse features: E9 dims plus the dim = -1 bias row per
    * doc, y = ±1 from the C16 gate (oracle-row params). */
  private def labeledFeatures(docs: DataFrame, dims: Int): DataFrame = {
    val labels = gateLabels(docs)
    DocEmbed.docEmbedSparse(docs, dims)
      .join(labels, "doc_id")
      .select(col("doc_id"), col("y"), col("dim"), col("q"))
      .unionByName(labels.select(col("doc_id"), col("y"),
        lit(-1L).as("dim"), lit(1L).as("q")))
  }

  def trainQualityModel(
      docs: DataFrame,
      dims: Int = DefaultDims,
      iters: Int = DefaultIters): DataFrame = {
    require(dims >= 2, s"dims must be >= 2, got $dims")
    require(iters >= 1 && iters <= 64, s"iters must be in [1, 64], got $iters")
    val spark = docs.sparkSession
    val (data, ck) = Checkpoints.tracked(labeledFeatures(docs, dims))
    try {
      var w = (-1L until dims.toLong).map(_ -> 0L).toMap
      val rows = Seq.newBuilder[(Long, Long, Long, Long)]
      for (t <- 1 to iters) {
        val wmap = map(w.toSeq.sortBy(_._1)
          .flatMap { case (d, v) => Seq(lit(d), lit(v)) }: _*)
        val scored = data
          .groupBy("doc_id", "y")
          .agg(sum(element_at(wmap, col("dim")) * col("q")).as("score"))
        val upd = data
          .join(scored.filter(col("y") * col("score") <= 0L).select("doc_id"),
            "doc_id")
          .groupBy("dim")
          .agg(sum(col("y") * col("q")).as("du"), count(lit(1)).as("c"))
          .collect()
          .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
        // every mistaken doc has exactly one bias row, so the bias
        // dimension's count IS the mistake count
        val nMistakes = upd.get(-1L).map(_._2).getOrElse(0L)
        w = w.map { case (d, v) => d -> (v + upd.get(d).map(_._1).getOrElse(0L)) }
        w.toSeq.sortBy(_._1).foreach { case (d, v) =>
          rows += ((t.toLong, d, v, nMistakes))
        }
      }
      import spark.implicits._
      rows.result().toDF("iter", "dim", "w", "n_mistakes")
        .orderBy("iter", "dim")
    } finally Checkpoints.release(ck)
  }

  private val OracleDims = DefaultDims
  private val OracleIters = DefaultIters

  val qQualityTrain: Q = Q(
    "q_quality_train",
    (s, d) => trainQualityModel(Tables.documents(s, d), OracleDims, OracleIters),
    Some {
      val its = (1 to OracleIters).map { k =>
        s"""s$k AS (
          SELECT d.doc_id, d.y, sum(w.w * d.q) AS score
          FROM data d JOIN w${k - 1} w ON d.dim = w.dim
          GROUP BY d.doc_id, d.y),
        m$k AS (SELECT doc_id FROM s$k WHERE y * score <= 0),
        u$k AS (
          SELECT d.dim, sum(d.y * d.q) AS du, count(*) AS c
          FROM data d JOIN m$k USING (doc_id) GROUP BY d.dim),
        w$k AS (
          SELECT w.dim, w.w + coalesce(u.du, 0) AS w
          FROM w${k - 1} w LEFT JOIN u$k u ON w.dim = u.dim)"""
      }.mkString(",\n        ")
      val unioned = (1 to OracleIters).map { k =>
        s"""SELECT $k AS iter, dim, w,
            coalesce((SELECT c FROM u$k WHERE dim = -1), 0) AS n_mistakes
          FROM w$k"""
      }.mkString(" UNION ALL ")
      s"""WITH ${TextAnalysis.sqlGopherCountsCte("documents")},
        lab AS (
          SELECT doc_id,
            CASE WHEN ${TextAnalysis.sqlGopherKeptCond}
              THEN 1 ELSE -1 END AS y
          FROM gc),
        ${DocEmbed.sqlDocEmbedSparseCtes("documents", OracleDims)},
        data AS (
          SELECT f.doc_id, l.y, f.dim, f.q
          FROM esp f JOIN lab l USING (doc_id)
          UNION ALL
          SELECT doc_id, y, CAST(-1 AS BIGINT) AS dim, CAST(1 AS BIGINT) AS q
          FROM lab),
        w0 AS (
          SELECT CAST(d AS BIGINT) AS dim, CAST(0 AS BIGINT) AS w
          FROM range(-1, $OracleDims) t(d)),
        $its
      SELECT CAST(iter AS BIGINT) AS iter, dim, CAST(w AS BIGINT) AS w,
        CAST(n_mistakes AS BIGINT) AS n_mistakes
      FROM ($unioned)
      ORDER BY iter, dim"""
    })

  val all: Seq[Q] = Seq(qQualityTrain)
}
