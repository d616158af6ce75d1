package graft.queries

import graft.{Q, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Domain-targeted data selection by importance resampling (DSIR —
  * Xie et al., "Data Selection for Language Models via Importance
  * Resampling", NeurIPS 2023): score every raw-corpus document by how
  * much its hashed n-gram feature distribution looks like a TARGET
  * (in-domain) sample versus the raw corpus itself, then keep the
  * top-k. The standard pretraining-curation move when you have a small
  * high-quality domain sample and 100 TB of crawl to sieve.
  *
  * Model: unigram + bigram features hashed into `buckets` buckets
  * (the paper's hashed n-gram parameterization). Per bucket b,
  * add-one-smoothed probabilities under the target and raw corpora:
  *
  *   p(b) = (ct_target(b) + 1) / (T_target + B)
  *   q(b) = (ct_raw(b)    + 1) / (T_raw    + B)
  *
  * and a document's log importance weight is
  * w(d) = Σ_b c_b(d) · ln(p(b)/q(b)) — the hashed-feature
  * log-likelihood ratio. `selected` flags the top-`keep` docs by
  * (weight DESC, doc_id).
  *
  * Determinism contract: feature hashing rides the shared portable
  * [[graft.functions.TextFunctions.polyHash]] (so DuckDB reproduces
  * the buckets bit-for-bit), and the per-bucket ln-ratio is QUANTIZED
  * to 2^20 fixed point before any aggregation (the
  * [[Similarity.labelCentroids]] pattern): a raw ln chain drifts a few
  * ULPs between JVM `Math.log` and libm across 4096 buckets (observed
  * -30.965939064137945 vs …95 on this very operator), while the
  * rounded integer absorbs the 1-ULP inputs and the per-doc weight
  * becomes a COMMUTATIVE integer sum — order-independent, so a plain
  * distributed `sum()` is safe and reproducible cluster-to-cluster;
  * /2^20 at output is an exact exponent shift on both engines.
  *
  * Scale shape: ONE corpus-sized pass — the feature explode into the
  * (doc, bucket) count matrix (memo-persisted; narrow rows like the
  * C8 tf matrix). Global bucket counts aggregate that matrix, totals
  * aggregate the B bucket rows, and the B-row model frame (B = 4096 →
  * a few hundred KB) broadcasts back onto the matrix; per-doc weights
  * are a map-side-combinable integer sum. The top-k runs as local
  * limits + a k-row global limit, then a broadcast join paints the
  * flag — no global window, no corpus-wide single-partition stage
  * anywhere. */
object Selection {

  private val B = 4096

  /** Fixed-point scale for the quantized ln-ratio: 2^20 (exponent
    * shift — exact in binary FP on multiply and on the final divide). */
  private val Fp = 1048576.0

  /** (doc_id, is_t, b): one row per feature occurrence. A NULL
    * `isTarget` (e.g. `col("source") === lit("x")` over a null source)
    * coalesces to raw — without it such docs would satisfy neither
    * `is_t` nor `!is_t` and silently vanish from both cohorts.
    *
    * Features come from the native one-pass
    * [[graft.functions.NativeExpressions.shingleHashes]] kernel
    * (= [[graft.functions.TextFunctions.polyHash]] of each
    * space-joined n-gram, the D4-mirrored hash the oracle reproduces);
    * the HOF formulation (shingles + concat_ws + polyHash) re-derived
    * the token array per element and benched 4× slower. explode_outer
    * dodges generator pushdown's re-evaluation of the hash expression
    * (the q_decontaminate lesson); the post-explode null filter is
    * free. */
  private def bucketed(docs: DataFrame, isTarget: Column): DataFrame =
    docs.select(col("doc_id"), coalesce(isTarget, lit(false)).as("is_t"),
        explode_outer(concat(
          graft.functions.NativeExpressions.shingleHashes(col("text"), 1),
          graft.functions.NativeExpressions.shingleHashes(col("text"), 2))).as("h"))
      .filter(col("h").isNotNull)
      .select(col("doc_id"), col("is_t"), pmod(col("h"), lit(B.toLong)).as("b"))

  /** Memo for the per-doc bucket-count matrix and the scored frame —
    * the C8-tf-matrix pattern: the model branch, the scoring branch,
    * and the top-k branch all fan out of them, and without the memo
    * each branch would re-tokenize and re-explode the corpus. */
  private[this] val selCache = new graft.ops.PlanCache(capacity = 4)

  /** Importance weights + selection flag for every raw (non-target)
    * doc with at least one feature: (doc_id, n_feats, weight,
    * selected), ordered by doc_id.
    *
    * ONE corpus-sized pass: the explode + (doc, bucket) hash agg.
    * Global per-bucket counts aggregate that matrix (input already
    * collapsed to distinct (doc, bucket) rows), totals aggregate the
    * B-row bucket counts, and the 4096-row model broadcasts back onto
    * the matrix. */
  def dsirWeights(
      docs: DataFrame,
      isTarget: Column,
      keep: Int = 50): DataFrame = {
    val perDocAll = selCache.memo(bucketed(docs, isTarget)
      .groupBy("doc_id", "is_t", "b").agg(count(lit(1)).as("c")))
    // not memoized: both consumers (the totals head() and the model
    // subplan) re-derive it from the persisted matrix with one
    // B-row-output agg — cheaper than a persist barrier
    val bCounts = perDocAll.groupBy("b").agg(
      sum(when(col("is_t"), col("c")).otherwise(0L)).as("ct_t"),
      sum(when(col("is_t"), 0L).otherwise(col("c"))).as("ct_r"))
    // totals ride as driver literals (the iterative-operator lesson
    // from the verify gotchas): one head() over the B-row persisted
    // counts frame instead of a crossJoin(broadcast(totalsDf)) subplan
    // — each broadcast subtree is a separate serial job, and this
    // chain had three of them. long→double conversion and the +B
    // addition are the same IEEE ops DuckDB applies to its CAST, so
    // the ln argument stays bit-identical.
    val tot = bCounts.agg(sum(col("ct_t")), sum(col("ct_r"))).head()
    require(!tot.isNullAt(0),
      "dsirWeights: corpus has no features — every doc is empty or tokenizes " +
        "to nothing (letter-run tokens); nothing to score")
    val (tDen, rDen) =
      (tot.getLong(0).toDouble + B.toDouble, tot.getLong(1).toDouble + B.toDouble)
    // model over the raw buckets (every scored doc's buckets are a
    // subset); target-absent buckets smooth to ct_t = 0. Operand
    // order mirrors the oracle SQL exactly — the ln argument must be
    // the same double on both engines.
    val model = bCounts.filter(col("ct_r") > 0)
      .select(col("b"),
        round(log(((col("ct_t").cast("double") + lit(1.0)) / lit(tDen)) /
          ((col("ct_r").cast("double") + lit(1.0)) / lit(rDen))) * lit(Fp))
          .cast("long").as("lr_fp"))
    val scored = selCache.memo(perDocAll.filter(!col("is_t"))
      .join(broadcast(model), "b")
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_feats"),
        sum(col("c") * col("lr_fp")).as("w_fp"))
      .select(col("doc_id"), col("n_feats"),
        (col("w_fp").cast("double") / lit(Fp)).as("weight"), col("w_fp")))
    val topk = scored
      .orderBy(col("w_fp").desc, col("doc_id")).limit(keep)
      .select(col("doc_id"), lit(1L).as("sel"))
    // explicit broadcast: topk is ≤ `keep` rows by construction, but
    // without the hint a planner misestimate at 100 TB would shuffle
    // the whole scored corpus for a 50-row join
    scored.join(broadcast(topk), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_feats"), col("weight"),
        coalesce(col("sel"), lit(0L)).as("selected"))
      .orderBy("doc_id")
  }

  /** The selected subset itself — what a pipeline feeds downstream. */
  def dsirSample(docs: DataFrame, isTarget: Column, keep: Int = 50): DataFrame =
    docs.join(
      dsirWeights(docs, isTarget, keep)
        .filter(col("selected") === 1L).select("doc_id", "weight"),
      Seq("doc_id"), "left_semi")

  /** Oracle row: target = the `src0` slice of `documents` (a ~5%
    * in-domain proxy present at every SF), raw = the rest. */
  val qDsirWeights: Q = Q(
    "q_dsir_weights",
    (s, d) => dsirWeights(Tables.documents(s, d), col("source") === "src0"),
    Some {
      val toks = s"list_filter(${sqlWords("text")}, t -> t <> '')"
      s"""WITH feats AS (
          SELECT doc_id, source = 'src0' AS is_t,
            unnest(list_concat(${sqlShingles("toks", 1)}, ${sqlShingles("toks", 2)})) AS f
          FROM (SELECT doc_id, source, $toks AS toks FROM documents)),
        bf AS (SELECT doc_id, is_t, ${sqlPolyHash("f")} % 4096 AS b FROM feats),
        totals AS (
          SELECT sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS t_tot,
            sum(CASE WHEN is_t THEN 0 ELSE 1 END) AS r_tot FROM bf),
        tc AS (SELECT b, count(*) AS ct_t FROM bf WHERE is_t GROUP BY 1),
        rc AS (SELECT b, count(*) AS ct_r FROM bf WHERE NOT is_t GROUP BY 1),
        model AS (
          SELECT rc.b,
            CAST(round(ln(((CAST(coalesce(ct_t, 0) AS DOUBLE) + 1.0::DOUBLE) /
                (CAST(t_tot AS DOUBLE) + 4096.0::DOUBLE)) /
              ((CAST(ct_r AS DOUBLE) + 1.0::DOUBLE) /
                (CAST(r_tot AS DOUBLE) + 4096.0::DOUBLE))) * 1048576.0::DOUBLE)
              AS BIGINT) AS lr_fp
          FROM rc LEFT JOIN tc ON rc.b = tc.b CROSS JOIN totals),
        per_doc AS (
          SELECT doc_id, b, count(*) AS c FROM bf WHERE NOT is_t GROUP BY 1, 2),
        scored AS (
          SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_feats,
            CAST(sum(c * lr_fp) AS DOUBLE) / 1048576.0::DOUBLE AS weight,
            sum(c * lr_fp) AS w_fp
          FROM per_doc JOIN model USING (b) GROUP BY doc_id),
        sel AS (SELECT doc_id FROM scored ORDER BY w_fp DESC, doc_id LIMIT 50)
        SELECT scored.doc_id, n_feats, weight,
          CAST(CASE WHEN sel.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS selected
        FROM scored LEFT JOIN sel ON scored.doc_id = sel.doc_id
        ORDER BY scored.doc_id"""
    })

  val all: Seq[Q] = Seq(qDsirWeights)
}
