package graft.queries

import graft.{Q, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Term ranking and retrieval (SURVEY.md §2 C8/C9): TF-IDF-style
  * keyword extraction and BM25 full-corpus search — the relevance
  * layer over the inverted-index family (A4).
  *
  * Scale shape: tf is one hash aggregation on (doc_id, term); df is an
  * aggregation over that result (vocabulary-sized, broadcastable); the
  * per-doc top-k window auto-rewrites to the bounded-heap TopKPerKey
  * operator under [[graft.GraftExtensions]], so the exchange carries at
  * most k rows per doc per partition instead of every (doc, term) pair.
  *
  * The df/stats branches would re-evaluate the tf subtree as lazy
  * plans (column pruning makes the two aggregates differ, so exchange
  * reuse can't fire), so the tf frame is memo-persisted
  * ([[graft.ops.PlanCache]]): every consumer reads the one cached
  * (doc, term, tf) matrix — which a production index materializes
  * anyway — and the corpus is tokenized exactly once per call site.
  */
object Ranking {

  /** Memo of the tf matrix shared by every ranking branch (see
    * [[graft.ops.PlanCache]]; released by [[graft.ops.Release]]). */
  private[this] val tfCache = new graft.ops.PlanCache(capacity = 2)

  /** The (doc_id, term, tf) matrix and its (term, df) marginal — the
    * shared base of [[topTerms]], [[tfidf]], [[unigramXent]], and
    * (inlined per query term) [[searchBm25]]. The tf side is persisted
    * via the plan-keyed memo, so the corpus scan + (doc_id, term)
    * aggregation run once even though consumers branch over it 2–3
    * times in one plan. */
  private def termFreqs(docs: DataFrame): (DataFrame, DataFrame) = {
    val tf = tfCache.memo(docs
      .select(col("doc_id"), explode(words(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf")))
    (tf, tf.groupBy("term").agg(count(lit(1)).as("df")))
  }

  /** Per-doc top-`k` characteristic terms, ranked by (tf DESC, df ASC,
    * term ASC) — highest-frequency-in-doc, rarest-in-corpus first. The
    * ranking key is ALL-INTEGER on purpose: the induced order is
    * exactly the classic tf·idf order for fixed tf (idf is monotone
    * decreasing in df), with a deterministic term tiebreak, and the
    * driver can hash-check it with no cross-engine float hazard.
    * [[tfidf]] exposes the real-valued score for library users. */
  def topTerms(docs: DataFrame, k: Int = 5): DataFrame = {
    val (tf, df) = termFreqs(docs)
    tf.join(df, "term")
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("tf").desc, col("df").asc, col("term").asc)))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        col("rank").cast("long").as("rank"))
      .orderBy("doc_id", "rank")
  }

  /** (doc_id, term, tf, df, tfidf) over the whole corpus —
    * tfidf = tf · ln(N / df) with N = docs containing ≥ 1 token. */
  def tfidf(docs: DataFrame): DataFrame = {
    val (tf, df) = termFreqs(docs)
    val n = tf.select(col("doc_id")).distinct().agg(count(lit(1)).as("n"))
    tf.join(df, "term").crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        (col("tf") * log(col("n").cast("double") / col("df"))).as("tfidf"))
  }

  val qTfidf: Q = Q(
    "q_tfidf",
    (s, d) => topTerms(Tables.documents(s, d)),
    Some(s"""WITH toks AS (
        SELECT doc_id, unnest(list_filter(${sqlWords("text")}, t -> t <> '')) AS term
        FROM documents),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
      df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
      SELECT doc_id, term, tf, df,
        row_number() OVER (PARTITION BY doc_id
          ORDER BY tf DESC, df ASC, term ASC) AS rank
      FROM tf JOIN df USING (term)
      QUALIFY rank <= 5
      ORDER BY doc_id, rank"""))

  /** BM25 (Okapi, Lucene's positive-idf variant) retrieval of the
    * `terms` disjunction over any (doc_id, text) frame:
    * score = Σ_t ln(1 + (N − df + 0.5)/(df + 0.5)) ·
    *             tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)).
    *
    * Determinism contract (what makes this hash-oracle-able): the
    * per-term partial scores are summed in the FIXED order of `terms`
    * (never a float `sum()` aggregate, whose order is partition-
    * dependent), and ln proved bit-identical between the JVM and DuckDB
    * over the idf argument range. Ties break on doc_id. */
  def searchBm25(
      docs: DataFrame,
      terms: Seq[String],
      k: Int = 15,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && terms.toSet.size == terms.size,
      "terms must be non-empty and distinct")
    val toks = docs.select(col("doc_id"), explode(words(col("text"))).as("term"))
    // one aggregation: doc length + per-query-term tf
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("term") === t, 1L).otherwise(0L)).as(s"tf_$i")
    }
    val perDoc = toks.groupBy("doc_id")
      .agg(count(lit(1)).as("dl"), tfCols: _*)
    val statCols = Seq(
      count(lit(1)).as("n"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl")) ++
      terms.indices.map(i =>
        sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"df_$i"))
    val stats = perDoc.agg(statCols.head, statCols.tail: _*)
    val scored = perDoc.crossJoin(broadcast(stats))
    def partScore(i: Int): Column = {
      val tf = col(s"tf_$i")
      val idf = log(lit(1.0) +
        (col("n") - col(s"df_$i") + lit(0.5)) / (col(s"df_$i") + lit(0.5)))
      idf * (tf * (lit(k1) + lit(1.0))) /
        (tf + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl")))
    }
    scored
      .withColumn("n_hits",
        terms.indices.map(i => when(col(s"tf_$i") > 0, 1L).otherwise(0L))
          .reduce(_ + _))
      .filter(col("n_hits") > 0)
      .withColumn("score", terms.indices.map(partScore).reduce(_ + _))
      .select(col("doc_id"), col("n_hits"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Unigram-LM cross-entropy quality score (SURVEY.md §2 C10) — the
    * CCNet-style "perplexity filter" of a training-data pipeline, with
    * the n-gram LM replaced by the corpus's own unigram model (no
    * external model artifact, fully SQL-expressible):
    * xent(d) = −(1/|d|) Σ_{t∈d} tf(t,d) · ln(ct(t)/T), where ct is the
    * corpus count of t and T the total token count. Repetitive,
    * common-word docs score LOW (kept); rare-garbage docs score HIGH.
    *
    * Determinism contract (same as [[searchBm25]]): the per-term double
    * partials are summed by an ordered array fold (sort by term, then
    * left-fold from 0.0) — never a float `sum()` aggregate, whose
    * addition order is partition-dependent. ln is bit-identical JVM vs
    * DuckDB; per-doc state is O(doc vocabulary), bounded by doc length.
    *
    * Scale shape: one (doc, term) hash aggregation (the same tf matrix
    * the ranking family shares), a vocabulary-sized model frame joined
    * on term (broadcast when the vocab fits, shuffle otherwise — both
    * fine), and a per-doc aggregation; no corpus-wide window anywhere. */
  def unigramXent(docs: DataFrame, threshold: Double = 7.0): DataFrame = {
    val (tf, _) = termFreqs(docs)
    val ct = tf.groupBy("term").agg(sum(col("tf")).as("ct"))
    val tot = ct.agg(sum(col("ct")).as("total"))
    val part = tf.join(ct, "term").crossJoin(broadcast(tot))
      .select(col("doc_id"), col("term"), col("tf"),
        (col("tf") * log(col("ct").cast("double") / col("total").cast("double")))
          .as("p"))
    part.groupBy("doc_id")
      .agg(sum(col("tf")).as("n_tokens"),
        sort_array(collect_list(struct(col("term"), col("p")))).as("ps"))
      .select(col("doc_id"), col("n_tokens"),
        (-aggregate(col("ps"), lit(0.0), (acc, x) => acc + x.getField("p")) /
          col("n_tokens").cast("double")).as("xent"))
      .withColumn("kept", when(col("xent") <= threshold, 1L).otherwise(0L))
      .orderBy("doc_id")
  }

  val qUnigramXent: Q = Q(
    "q_unigram_xent",
    (s, d) => unigramXent(Tables.documents(s, d)),
    Some(s"""WITH toks AS (
        SELECT doc_id, unnest(list_filter(${sqlWords("text")}, t -> t <> '')) AS term
        FROM documents),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
      ct AS (SELECT term, sum(tf) AS ct FROM tf GROUP BY 1),
      tot AS (SELECT sum(ct) AS total FROM ct),
      part AS (
        SELECT doc_id, term, tf,
          tf * ln(CAST(ct AS DOUBLE) / CAST(total AS DOUBLE)) AS p
        FROM tf JOIN ct USING (term) CROSS JOIN tot),
      agg AS (
        SELECT doc_id,
          CAST(sum(tf) AS BIGINT) AS n_tokens,
          list(p ORDER BY term) AS ps
        FROM part GROUP BY doc_id)
      SELECT doc_id, n_tokens,
        (-list_reduce(list_prepend(0.0::DOUBLE, ps), (acc, x) -> acc + x))
          / CAST(n_tokens AS DOUBLE) AS xent,
        CAST(CASE WHEN (-list_reduce(list_prepend(0.0::DOUBLE, ps), (acc, x) -> acc + x))
          / CAST(n_tokens AS DOUBLE) <= 7.0::DOUBLE THEN 1 ELSE 0 END AS BIGINT) AS kept
      FROM agg
      ORDER BY doc_id"""))

  /** Fixed query for the driver row — three corpus terms spanning
    * high / mid / low document frequency. */
  private val QueryTerms = Seq("spark", "window", "vector")

  val qBm25: Q = Q(
    "q_bm25",
    (s, d) => searchBm25(Tables.documents(s, d), QueryTerms),
    Some {
      val tfCols = QueryTerms.zipWithIndex.map { case (t, i) =>
        s"count(*) FILTER (term = '$t') AS tf_$i"
      }.mkString(", ")
      val dfCols = QueryTerms.indices.map(i =>
        s"sum(CASE WHEN tf_$i > 0 THEN 1 ELSE 0 END) AS df_$i").mkString(", ")
      // every literal cast to DOUBLE: DuckDB parses bare numeric
      // literals as DECIMAL and computes tf·(1.2+1.0) EXACTLY (15.4),
      // one ULP off the JVM's double product — found the hard way
      def part(i: Int): String =
        s"""ln(1.0::DOUBLE + (n - df_$i + 0.5::DOUBLE) / (df_$i + 0.5::DOUBLE))
           * (tf_$i * (1.2::DOUBLE + 1.0::DOUBLE)) /
           (tf_$i + 1.2::DOUBLE * (1.0::DOUBLE - 0.75::DOUBLE + 0.75::DOUBLE * dl / avgdl))"""
      val hits = QueryTerms.indices
        .map(i => s"CASE WHEN tf_$i > 0 THEN 1 ELSE 0 END").mkString(" + ")
      // left-associated sum in the same term order as the Spark plan
      val score = QueryTerms.indices.map(part).mkString("(", ") + (", ")")
      s"""WITH toks AS (
        SELECT doc_id, unnest(list_filter(${sqlWords("text")}, t -> t <> '')) AS term
        FROM documents),
      per_doc AS (
        SELECT doc_id, count(*) AS dl, $tfCols FROM toks GROUP BY doc_id),
      stats AS (
        SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl, $dfCols
        FROM per_doc)
      SELECT doc_id, CAST($hits AS BIGINT) AS n_hits, $score AS score
      FROM per_doc CROSS JOIN stats
      WHERE $hits > 0
      ORDER BY score DESC, doc_id
      LIMIT 15"""
    })

  val all: Seq[Q] = Seq(qTfidf, qBm25, qUnigramXent)
}
