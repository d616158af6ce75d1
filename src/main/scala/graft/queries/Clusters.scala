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

  /** Cluster labels over any (doc_id, text) frame: one row per doc with
    * `component` = min doc_id of its dedup cluster, the cluster size,
    * and `is_survivor` (the canonical keep-this-one flag). Singleton
    * docs are their own component. */
  def dedupClusters(docs: DataFrame): DataFrame = {
    val exactPairs = Dedup.exactDupPairs(docs)
    val nearPairs = Dedup.minhashPairs(docs)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val labels = ConnectedComponents.connectedComponents(
      exactPairs.union(nearPairs))
    val ids = docs.select(col("doc_id"))
    ids.join(labels, ids("doc_id") === labels("node"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("component"))
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy(col("component"))))
      .withColumn("is_survivor", col("doc_id") === col("component"))
      .orderBy("doc_id")
  }

  val qDedupClusters: Q = Q(
    "q_dedup_clusters",
    (s, d) => dedupClusters(Tables.documents(s, d)),
    Some(s"""WITH RECURSIVE ${Dedup.sqlMinhashPairCtes("documents")},
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
      sym AS (SELECT u, v FROM edges UNION SELECT v AS u, u AS v FROM edges),
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

  val all: Seq[Q] = Seq(qDedupClusters)
}
