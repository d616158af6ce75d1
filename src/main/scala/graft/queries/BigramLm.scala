package graft.queries

import graft.{Q, Tables}
import graft.functions.TextFunctions.{sqlWords, words}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** C23: bigram-LM perplexity scoring with CCNet-style head/middle/tail
  * bucketing — the n-gram "perplexity filter" one level up from C10's
  * unigram form: an add-one-smoothed bigram model
  * p(w|v) = (c(v,w) + 1) / (c(v) + V) is trained on the corpus itself
  * and every document is scored by its bigram cross-entropy
  * xent(d) = −(1/|bigrams(d)|) Σ tf(v w) · ln p(w|v). Low xent = fluent,
  * in-domain text (CCNet's "head"); high = rare-garbage ("tail").
  *
  * Determinism contract: each model ln is QUANTIZED to 2^20 fixed point
  * before any aggregation (JVM Math.log vs libm differ by 1 ULP on some
  * arguments — an ordered fold does not save a many-term sum; the DSIR
  * row's lesson). The per-doc sum is then a plain commutative integer
  * `sum()`, and the one double division at output sees identical
  * operands on both engines. Well inside 2^53: |Σ tf·qln| ≲
  * doc_tokens · 20·2^20 ≈ 2·10^7·len.
  *
  * Bucketing: terciles of the 2^14-quantized xent via the C15
  * bounded-histogram threshold pass — the key space is the score RANGE
  * (≤ ~30·2^14 buckets however large the corpus), never a
  * percentile_disc over per-doc doubles (the round-6 scale killer).
  * Ties at a threshold fall into the LOWER (better) bucket.
  *
  * Scale shape: one (doc, bigram) hash aggregation (memo-persisted —
  * both the model branch and the scoring branch read it), a
  * bigram-vocabulary model frame joined back on the bigram key
  * (shuffle join; both sides already partitioned by that key from
  * their aggs), a broadcast 1-row vocab count, and the bounded
  * histogram for thresholds. Docs with fewer than two tokens have no
  * bigrams and are dropped (documented; the oracle matches). */
object BigramLm {

  private[this] val cache = new graft.ops.PlanCache(capacity = 2)

  /** 2^20 fixed-point quantum for model log-probabilities. */
  private val LnQ = 1048576.0
  /** 2^14 xent quantum for the tercile threshold domain. */
  private val XuQ = 16384.0

  def bigramLm(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), words(col("text")).as("ws"))
    val bg = toks.filter(size(col("ws")) >= 2)
      .select(col("doc_id"),
        explode(zip_with(
          slice(col("ws"), lit(1), size(col("ws")) - 1),
          slice(col("ws"), lit(2), size(col("ws")) - 1),
          (a, b) => concat(a, lit(" "), b))).as("bg"))
    val tf = cache.memo(bg.groupBy("doc_id", "bg").agg(count(lit(1)).as("tf")))
    val cvw = tf.groupBy("bg").agg(sum(col("tf")).as("c_vw"))
    val cv = cvw.groupBy(substring_index(col("bg"), " ", 1).as("v"))
      .agg(sum(col("c_vw")).as("c_v"))
    val vocab = docs.select(explode(words(col("text"))).as("w"))
      .agg(count_distinct(col("w")).as("vsz"))
    val model = cvw.withColumn("v", substring_index(col("bg"), " ", 1))
      .join(cv, "v")
      .crossJoin(broadcast(vocab))
      .select(col("bg"),
        round(log((col("c_vw") + 1L).cast("double") /
          (col("c_v") + col("vsz")).cast("double")) * LnQ)
          .cast("long").as("qln"))
    val scored = cache.memo(tf.join(model, "bg")
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("n_bigrams"),
        sum(col("tf") * col("qln")).as("qsum"))
      .select(col("doc_id"), col("n_bigrams"),
        ((-col("qsum")).cast("double") /
          (col("n_bigrams") * LnQ.toLong).cast("double")).as("xent"))
      .withColumn("xu", floor(col("xent") * XuQ).cast("long")))
    // bounded-histogram tercile thresholds (C15 pattern): windows run
    // over histogram ROWS only, never the corpus
    import org.apache.spark.sql.expressions.Window
    val hist = scored.groupBy("xu").agg(count(lit(1)).as("cnt"))
    val wCum = Window.orderBy("xu")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy("xu")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = hist.select(col("xu"),
      sum(col("cnt")).over(wCum).as("cum"),
      sum(col("cnt")).over(wAll).as("n_tot"))
    val ths = cum.agg(
      min(when(col("cum") * 3L >= col("n_tot") * 1L, col("xu"))).as("t1"),
      min(when(col("cum") * 3L >= col("n_tot") * 2L, col("xu"))).as("t2"))
    scored.crossJoin(broadcast(ths))
      .select(col("doc_id"), col("n_bigrams"), col("xent"),
        when(col("xu") > col("t2"), "tail")
          .when(col("xu") > col("t1"), "middle")
          .otherwise("head").as("ppl_bucket"))
      .orderBy("doc_id")
  }

  val qBigramLm: Q = Q(
    "q_bigram_lm",
    (s, d) => bigramLm(Tables.documents(s, d)),
    Some(s"""WITH toks AS (
        SELECT doc_id, list_filter(${sqlWords("text")}, t -> t <> '') AS ws
        FROM documents),
      bgs AS (
        SELECT doc_id, unnest([ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]) AS bg
        FROM toks WHERE len(ws) >= 2),
      tf AS (SELECT doc_id, bg, count(*) AS tf FROM bgs GROUP BY 1, 2),
      cvw AS (SELECT bg, sum(tf) AS c_vw FROM tf GROUP BY 1),
      cv AS (SELECT split_part(bg, ' ', 1) AS v, sum(c_vw) AS c_v
        FROM cvw GROUP BY 1),
      vocab AS (SELECT count(DISTINCT t) AS vsz FROM (
        SELECT unnest(list_filter(${sqlWords("text")}, t -> t <> '')) AS t
        FROM documents)),
      model AS (
        SELECT bg, CAST(round(ln(CAST(c_vw + 1 AS DOUBLE) /
            CAST(c_v + vsz AS DOUBLE)) * 1048576.0::DOUBLE) AS BIGINT) AS qln
        FROM cvw JOIN cv ON split_part(cvw.bg, ' ', 1) = cv.v
        CROSS JOIN vocab),
      scored AS (
        SELECT doc_id,
          CAST(sum(tf) AS BIGINT) AS n_bigrams,
          CAST(-sum(tf * qln) AS DOUBLE) /
            CAST(sum(tf) * 1048576 AS DOUBLE) AS xent
        FROM tf JOIN model USING (bg) GROUP BY 1),
      u AS (SELECT doc_id, n_bigrams, xent,
          CAST(floor(xent * 16384.0::DOUBLE) AS BIGINT) AS xu FROM scored),
      hist AS (SELECT xu, count(*) AS cnt FROM u GROUP BY 1),
      cum AS (SELECT xu,
          sum(cnt) OVER (ORDER BY xu ROWS BETWEEN UNBOUNDED PRECEDING
            AND CURRENT ROW) AS cum,
          sum(cnt) OVER () AS n_tot
        FROM hist),
      th AS (SELECT
          min(CASE WHEN cum * 3 >= n_tot * 1 THEN xu END) AS t1,
          min(CASE WHEN cum * 3 >= n_tot * 2 THEN xu END) AS t2
        FROM cum)
      SELECT doc_id, n_bigrams, xent,
        CASE WHEN xu > t2 THEN 'tail'
             WHEN xu > t1 THEN 'middle'
             ELSE 'head' END AS ppl_bucket
      FROM u CROSS JOIN th ORDER BY doc_id"""))

  val all: Seq[Q] = Seq(qBigramLm)
}
