package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph centrality over the supply graph (SURVEY.md §2 D11 family —
  * graph analytics): PageRank on the part↔supplier bipartite graph
  * induced by lineitem (an edge per distinct (supplier, part) pair,
  * both directions — well-connected suppliers and widely-sourced parts
  * rank high). The oracle reproduces the integer fixed-point iteration
  * ([[graft.ops.PageRank]]) as a chained-CTE unrolling — bit-exact
  * because every operation is BIGINT arithmetic.
  */
object GraphRank {

  /** Fixed iteration budget (deterministic output). */
  val Iters = 5

  /** Node encoding for the bipartite graph: parts on even ids,
    * suppliers on odd — key spaces stay disjoint at any SF. */
  private def edges(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select((col("l_partkey") * 2).as("p"), (col("l_suppkey") * 2 + 1).as("su"))
      .distinct()

  def supplyGraphRank(s: SparkSession, d: String): DataFrame = {
    val e = edges(s, d)
    val both = e.select(col("p").as("src"), col("su").as("dst"))
      .unionByName(e.select(col("su").as("src"), col("p").as("dst")))
    graft.ops.PageRank.pageRank(both, iterations = Iters)
      .select(
        when(col("node") % 2 === 0, "part").otherwise("supplier").as("kind"),
        expr("node div 2").as("key"),
        col("rank"))
      .orderBy("kind", "key")
  }

  val qPageRank: Q = Q(
    "q_pagerank",
    (s, d) => supplyGraphRank(s, d),
    Some {
      val U = graft.ops.PageRank.Unit
      // unrolled iterations: it0 = uniform mass, each itK = one damped
      // update with dangling redistribution (dm is 0 on this graph —
      // every node has an out-edge — but the term is part of the
      // operator contract and stays in the oracle)
      val its = (1 to Iters).map { k =>
        s"""st${k - 1} AS (
          SELECT coalesce(sum(CASE WHEN out = 0 THEN rank END), 0) AS dm,
                 count(*) AS n
          FROM it${k - 1}),
        it$k AS (
          SELECT g.node, g.out,
            ${15 * U / 100} + (coalesce(inf.v, 0) + (SELECT dm FROM st${k - 1}) // (SELECT n FROM st${k - 1})) // 20 * 17 AS rank
          FROM deg g LEFT JOIN (
            SELECT e.d AS node, sum(r.rank // r.out) AS v
            FROM it${k - 1} r JOIN e ON r.node = e.s
            WHERE r.out > 0 GROUP BY 1) inf ON g.node = inf.node)"""
      }.mkString(",\n        ")
      s"""WITH pairs AS (
        SELECT DISTINCT l_partkey * 2 AS p, l_suppkey * 2 + 1 AS su FROM lineitem),
      e AS (
        SELECT p AS s, su AS d FROM pairs UNION SELECT su, p FROM pairs),
      nodes AS (SELECT DISTINCT s AS node FROM e UNION SELECT DISTINCT d FROM e),
      deg AS (
        SELECT n.node, coalesce(o.out, 0) AS out
        FROM nodes n LEFT JOIN (SELECT s, count(*) AS out FROM e GROUP BY 1) o
          ON n.node = o.s),
      it0 AS (SELECT node, out, $U::BIGINT AS rank FROM deg),
      $its
      SELECT CASE WHEN node % 2 = 0 THEN 'part' ELSE 'supplier' END AS kind,
        node // 2 AS key,
        CAST(rank AS BIGINT) AS rank
      FROM it$Iters ORDER BY kind, key"""
    })

  val all: Seq[Q] = Seq(qPageRank)
}
