package graft.queries

import graft.{Q, Tables}
import graft.functions.TextFunctions.{sqlNormText, sqlPolyHash}
import graft.ops.ConnectedComponents
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dedup cluster formation (SURVEY.md §2 D7): pairwise near-dup output →
  * transitive clusters → one survivor per cluster. The missing last
  * stage of a production dedup pipeline: D1–D5 emit PAIRS, but a chain
  * a–b, b–c must collapse to ONE survivor even though (a, c) was never
  * emitted as a pair. Clustering is connected components over the union
  * of the exact-dup and MinHash near-dup pair sets
  * ([[graft.ops.ConnectedComponents]] — O(log n)-round star algorithm,
  * never O(diameter) flooding).
  *
  * The oracle reproduces the full pipeline (exact-dup window + the D2
  * signature→band→pair CTEs + a recursive-CTE transitive closure), so
  * both the pair generation AND the clustering are hash-checked.
  */
object Clusters {

  /** Memo for the dedup pair graph (exact ∪ MinHash pairs) — the build
    * that dominates BOTH D7 (CC labeling) and D25 (LPA labeling)
    * in-sweep. Plan-keyed: one session — or one bench row's two timed
    * passes — pays the signature/band/rescore pipeline once and both
    * labeling policies read the same persisted pair set (the C12
    * counts / D14 gram-frame memo precedents: an EXPENSIVE shared
    * stage whose output is tiny. Contrast GraphRank.coPurchaseEdges,
    * where the same move measured 2.5–4× SLOWER — cheap-to-rebuild
    * frame, join-heavy consumers — and was backed out). */
  private[this] val pairCache = new graft.ops.PlanCache(capacity = 2)

  /** The dedup pair graph (src, dst) over any (doc_id, text) frame,
    * memo-persisted — ONE definition shared by [[dedupClusters]] and
    * [[dedupCommunities]], mirroring the shared oracle CTE chain
    * [[sqlPairGraphCtes]]. */
  private def dedupPairGraph(docs: DataFrame): DataFrame =
    pairCache.memo(
      Dedup.exactDupPairs(docs).union(
        Dedup.minhashPairs(docs)
          .select(col("id_a").as("src"), col("id_b").as("dst"))))

  /** Cluster labels over any (doc_id, text) frame: one row per doc with
    * `component` = min doc_id of its dedup cluster, the cluster size,
    * and `is_survivor` (the canonical keep-this-one flag). Singleton
    * docs are their own component. */
  def dedupClusters(docs: DataFrame): DataFrame = {
    val labels = ConnectedComponents.connectedComponents(dedupPairGraph(docs))
    val ids = docs.select(col("doc_id"))
    ids.join(labels, ids("doc_id") === labels("node"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("component"))
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy(col("component"))))
      .withColumn("is_survivor", col("doc_id") === col("component"))
      .orderBy("doc_id")
  }

  /** The dedup pair graph as oracle CTEs ending in `sym (u, v)` — the
    * SAME chain for [[qDedupClusters]] (CC labeling) and
    * [[qDedupCommunities]] (LPA labeling), so the two policies are
    * proven over an identical graph. */
  private def sqlPairGraphCtes: String =
    s"""${Dedup.sqlMinhashPairCtes("documents")},
      keyed AS (
        SELECT doc_id, md5(${sqlNormText("text")}) AS k1,
               ${sqlPolyHash(sqlNormText("text"))} AS k2
        FROM documents),
      exact_pairs AS (
        SELECT m AS u, doc_id AS v FROM (
          SELECT doc_id, min(doc_id) OVER (PARTITION BY k1, k2) AS m
          FROM keyed) t
        WHERE doc_id <> m),
      edges AS (
        SELECT u, v FROM exact_pairs
        UNION
        SELECT id_a AS u, id_b AS v FROM mh_pairs),
      sym AS (SELECT u, v FROM edges UNION SELECT v AS u, u AS v FROM edges)"""

  val qDedupClusters: Q = Q(
    "q_dedup_clusters",
    (s, d) => dedupClusters(Tables.documents(s, d)),
    Some(s"""WITH RECURSIVE $sqlPairGraphCtes,
      reach AS (
        SELECT doc_id AS u, doc_id AS v FROM documents
        UNION
        SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u),
      lab AS (SELECT u AS doc_id, min(v) AS component FROM reach GROUP BY u)
      SELECT doc_id, component,
        count(*) OVER (PARTITION BY component) AS cluster_size,
        doc_id = component AS is_survivor
      FROM lab
      ORDER BY doc_id"""))

  /** D25: near-dup COMMUNITIES — the SAME pair graph as
    * [[dedupClusters]], labeled by fixed-iteration label propagation
    * ([[graft.ops.LabelPropagation]]) instead of connected components.
    * CC implements the TRANSITIVE policy: one low-similarity link
    * merges two otherwise-unrelated duplicate groups — correct when
    * pairs are high-precision, catastrophic under banding false
    * positives (one hash-collision bridge fuses two big clusters and
    * the survivor rule then deletes one of them wholesale). LPA
    * implements the DENSITY policy: a group keeps its label unless its
    * neighbors' votes overwhelm it, so dense duplicate groups joined
    * by a sparse accidental bridge stay separate (LpaSpec's
    * bridged-clique dynamics), while a genuine chain of strong pairs
    * still merges. Ship both labelings: rows where they DISAGREE are
    * exactly the rows where dedup policy matters — a review queue, not
    * a bug. `community` is the elected label (an id drawn from the
    * graph — unlike CC's component, not guaranteed to label itself);
    * docs with no pairs are their own singleton community. */
  /** Default LPA iteration budget — shared by [[dedupCommunities]]'s
    * signature and [[qDedupCommunities]]'s oracle chain (the TextRank
    * `WindowDefault` coupling class: one constant, no silent desync). */
  val DedupCommunityIters = 3

  def dedupCommunities(
      docs: DataFrame, iterations: Int = DedupCommunityIters): DataFrame = {
    val e = dedupPairGraph(docs)
    val labels = graft.ops.LabelPropagation.propagate(
      e.union(e.select(col("dst"), col("src"))), iterations = iterations)
    val ids = docs.select(col("doc_id"))
    ids.join(labels, ids("doc_id") === labels("node"), "left")
      .select(col("doc_id"),
        coalesce(col("label"), col("doc_id")).as("community"))
      .withColumn("community_size",
        count(lit(1)).over(Window.partitionBy(col("community"))))
      .orderBy("doc_id")
  }

  /** D25's oracle: the shared pair-graph chain + the D24 LPA iteration
    * CTEs (MATERIALIZED — the exponential-inlining lesson) + the
    * singleton fill. */
  val qDedupCommunities: Q = Q(
    "q_dedup_communities",
    (s, d) => dedupCommunities(Tables.documents(s, d)),
    Some {
      val iters = DedupCommunityIters
      val its = (1 to iters).map { k =>
        s"""v$k AS MATERIALIZED (SELECT s.v AS node, l.label
            FROM it${k - 1} l JOIN sym s ON l.node = s.u
          UNION ALL SELECT node, label FROM it${k - 1}),
        c$k AS MATERIALIZED (SELECT node, label, count(*) AS cnt
          FROM v$k GROUP BY 1, 2),
        m$k AS MATERIALIZED (SELECT node, max(cnt) AS mc FROM c$k GROUP BY 1),
        it$k AS MATERIALIZED (SELECT c.node, min(c.label) AS label
          FROM c$k c JOIN m$k m ON c.node = m.node AND c.cnt = m.mc
          GROUP BY 1)"""
      }.mkString(",\n      ")
      s"""WITH $sqlPairGraphCtes,
      it0 AS MATERIALIZED (SELECT node, node AS label FROM (
        SELECT DISTINCT u AS node FROM sym)),
      $its,
      lab AS (SELECT d.doc_id, coalesce(i.label, d.doc_id) AS community
        FROM documents d LEFT JOIN it$iters i ON d.doc_id = i.node)
      SELECT doc_id, community,
        count(*) OVER (PARTITION BY community) AS community_size
      FROM lab
      ORDER BY doc_id"""
    })

  val all: Seq[Q] = Seq(qDedupClusters, qDedupCommunities)
}
