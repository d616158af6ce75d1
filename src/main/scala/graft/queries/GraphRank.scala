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

  /** The distinct co-purchase edge list (u < v) over any lineitem
    * frame — ONE definition shared by [[triangles]] and
    * [[communities]], so the two rows cannot drift.
    *
    * Deliberately NOT PlanCache-memoized (a round-12 negative result,
    * measured): persisting this frame made every consumer SLOWER —
    * q_triangles 3.9 s raw vs 17.2 s cold-cache / 12.3 s WARM-cache
    * isolated min-of-3 at sf0.1, q_communities 5.5 vs 6.7 s — with
    * identical join structure in both final plans. The AQE-replanned
    * raw subtree (exchange reuse + coalesced shuffle reads feeding
    * every consumer) beats InMemoryTableScan-fed joins by 2.5–4x here
    * even after eager materialization and explicit broadcast hints,
    * and the saved rebuild is only ~2.5 s. The memo pattern stays
    * right where the shared stage is expensive relative to its
    * consumers' plans (C12 counts, D14 gram frames, the D7/D25 pair
    * graph); for a cheap-to-rebuild frame feeding join-heavy
    * consumers, recompute wins. */
  private[queries] def coPurchaseEdges(lineitem: DataFrame): DataFrame = {
    // widenScan: the 600k-row parquet decode ahead of the distinct is
    // otherwise a one-task stage (guide §2.5); the distinct's partial
    // agg barely collapses (o, p) pairs, so the extra narrow exchange
    // costs less than the serialized decode
    val li = graft.ops.ScaleOps.widenScan(lineitem, "l_orderkey")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    li.as("a").join(li.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v")).distinct()
  }

  /** Node encoding for the bipartite graph: parts on even ids,
    * suppliers on odd — key spaces stay disjoint at any SF. */
  private def edges(s: SparkSession, d: String): DataFrame =
    graft.ops.ScaleOps.widenScan(Tables.lineitem(s, d), "l_orderkey")
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

  /** The integer-PageRank oracle chain over a previously defined CTE
    * `e (s, d)`: nodes/deg/it0..itN — shared by [[qPageRank]] and the
    * C24 TextRank row so the two cannot drift. Ends with `it<iters>`
    * carrying (node, out, rank). */
  private[queries] def sqlPageRankChain(iters: Int): String = {
    val U = graft.ops.PageRank.Unit
    // unrolled iterations: it0 = uniform mass, each itK = one damped
    // update with dangling redistribution (dm is 0 on graphs where
    // every node has an out-edge — but the term is part of the
    // operator contract and stays in the oracle)
    val its = (1 to iters).map { k =>
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
    s"""nodes AS (SELECT DISTINCT s AS node FROM e UNION SELECT DISTINCT d FROM e),
      deg AS (
        SELECT n.node, coalesce(o.out, 0) AS out
        FROM nodes n LEFT JOIN (SELECT s, count(*) AS out FROM e GROUP BY 1) o
          ON n.node = o.s),
      it0 AS (SELECT node, out, $U::BIGINT AS rank FROM deg),
      $its"""
  }

  val qPageRank: Q = Q(
    "q_pagerank",
    (s, d) => supplyGraphRank(s, d),
    Some {
      s"""WITH pairs AS (
        SELECT DISTINCT l_partkey * 2 AS p, l_suppkey * 2 + 1 AS su FROM lineitem),
      e AS (
        SELECT p AS s, su AS d FROM pairs UNION SELECT su, p FROM pairs),
      ${sqlPageRankChain(Iters)}
      SELECT CASE WHEN node % 2 = 0 THEN 'part' ELSE 'supplier' END AS kind,
        node // 2 AS key,
        CAST(rank AS BIGINT) AS rank
      FROM it$Iters ORDER BY kind, key"""
    })

  /** D23: per-node triangle counts over the part CO-PURCHASE graph
    * (undirected edge = two parts sharing an order) — the local
    * clustering signal behind "frequently bought together" analysis,
    * and the classic distributed-graph benchmark.
    *
    * Algorithm: DEGREE-ORIENTED counting (Cohen '09 / the MR classic):
    * every undirected edge is oriented from its lower-(degree, id)
    * endpoint to the higher, wedges enumerate only from each node's
    * ORIENTED adjacency (bounded by Σ d⁺(v)² where d⁺ ≤ √(2·|E|) —
    * the hub that explodes naive wedge counting never fans out), and
    * a wedge closes iff its (b, c) closing edge exists in the same
    * oriented set. Each triangle is found exactly once.
    *
    * Scale shape: the edge list is built from one order-keyed
    * self-join of the DISTINCT (order, part) pairs (co-partitioned on
    * the order key), degrees are one count agg, and the wedge/closure
    * steps are two equi-joins on node keys. No driver state, no
    * corpus-wide window. The oracle counts the same triangles by the
    * naive id-ordered 3-way join — hash-equality is the
    * orientation-correctness proof (each triangle once, none missed).
    * Output: (part, degree, n_tri) for every part with at least one
    * co-purchase edge (isolated parts have no graph presence). */
  def triangles(lineitem: DataFrame): DataFrame = {
    val e = coPurchaseEdges(lineitem)
    val deg = e.select(col("u").as("node"))
      .unionByName(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val er = e
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
    val uFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val oriented = er.select(
      when(uFirst, col("u")).otherwise(col("v")).as("s"),
      when(uFirst, col("v")).otherwise(col("u")).as("t"))
    // per-node oriented adjacency (out-degree <= sqrt(2|E|) by the
    // orientation, so these arrays stay bounded at any graph size);
    // triangles per oriented edge (a, b) = adj+(a) ∩ adj+(b) — each
    // triangle {a→b, a→c, b→c} is found at (a, b) and nowhere else.
    // This never materializes the wedge set (the 72M-row join the
    // first cut paid at sf0.1); the intersection runs as one
    // codegen'd array op per edge.
    //
    // Adjacency joins BROADCAST below a SCAN-SIZE gate: shuffled, the
    // second join re-ships every edge's na array (Σ per-edge adjacency
    // payload — measured 440 MB at sf0.1, 3.5× everything else in the
    // plan, and the GC source behind this row's historical
    // bimodality); broadcast, the arrays ship once per executor
    // (Σd⁺ = |E| longs ≈ 15 MB here) and the edge list never moves.
    // The gate reads the INPUT's optimizer size estimate — free, no
    // extra job or count pass over the self-join — and edges grow
    // ~linearly in lineitem bytes for the bounded-parts-per-order
    // co-purchase shape (11 MB → ~1.2 M edges → ~15 MB adjacency), so
    // 64 MB of input keeps the broadcast under ~200 MB; past the gate
    // the shuffle join is the scale path, at zero local cost.
    val adjBroadcastable = lineitem.queryExecution.optimizedPlan
      .stats.sizeInBytes < (64L << 20)
    def maybeBroadcast(df: DataFrame): DataFrame =
      if (adjBroadcastable) broadcast(df) else df
    val adj = maybeBroadcast(oriented.groupBy(col("s").as("n"))
      .agg(sort_array(collect_list(col("t"))).as("nbrs")))
    val withCommon = oriented
      .join(adj.select(col("n").as("s"), col("nbrs").as("na")), "s")
      .join(adj.select(col("n").as("t"), col("nbrs").as("nb")), "t")
      // native sort-merge intersection: array_intersect builds a boxed
      // hash set per EDGE — measured 97 s CPU at sf0.1; the primitive
      // merge kernel returns the same (distinct-input) element set,
      // ascending — order-insensitive consumers (size/explode) only
      .select(col("s"), col("t"),
        graft.functions.NativeExpressions
          .sortedIntersect(col("na"), col("nb")).as("common"))
      .filter(size(col("common")) > 0)
    // node attribution: the edge endpoints each join |common| triangles
    // through this edge; every common neighbor joins one
    val stCounts = withCommon.select(
      explode(array(col("s"), col("t"))).as("node"),
      size(col("common")).cast("long").as("k"))
    val cCounts = withCommon.select(
      explode(col("common")).as("node"), lit(1L).as("k"))
    val perNode = stCounts.unionByName(cCounts)
      .groupBy("node").agg(sum(col("k")).as("n_tri"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node").as("part"), col("deg").as("degree"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .orderBy("part")
  }

  val qTriangles: Q = Q(
    "q_triangles",
    (s, d) => triangles(Tables.lineitem(s, d)),
    Some("""WITH li AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      e AS (SELECT DISTINCT a.p AS u, b.p AS v
        FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
      deg AS (SELECT node, count(*) AS deg FROM (
          SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
        GROUP BY 1),
      tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM e e1
        JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
        JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v),
      cnt AS (SELECT node, count(*) AS n_tri FROM (
          SELECT a AS node FROM tri
          UNION ALL SELECT b AS node FROM tri
          UNION ALL SELECT c AS node FROM tri)
        GROUP BY 1)
      SELECT d.node AS part, d.deg AS degree,
        CAST(coalesce(cnt.n_tri, 0) AS BIGINT) AS n_tri
      FROM deg d LEFT JOIN cnt ON d.node = cnt.node
      ORDER BY part"""))

  /** D24: label-propagation communities over the part co-purchase
    * graph (D23's edge construction) — community detection completing
    * the graph family: D7 components (membership), D11 centrality,
    * D23 local clustering, D24 communities. Fixed-iteration
    * synchronous LPA with a self-vote and (max count, min label)
    * deterministic ties ([[graft.ops.LabelPropagation]]), so the whole
    * pipeline — edge build, vote join, count argmax, tie-break —
    * replays as chained integer CTEs (the D11 oracle pattern).
    * Output: (part, community, community_size), community = the
    * elected label. */
  def communities(lineitem: DataFrame, iterations: Int = Iters): DataFrame = {
    val e = coPurchaseEdges(lineitem)
    val both = e.select(col("u").as("src"), col("v").as("dst"))
      .unionByName(e.select(col("v").as("src"), col("u").as("dst")))
    val labels = graft.ops.LabelPropagation.propagate(both,
      iterations = iterations)
    val sizes = labels.groupBy("label").agg(count(lit(1)).as("community_size"))
    labels.join(sizes, Seq("label"))
      .select(col("node").as("part"), col("label").as("community"),
        col("community_size"))
      .orderBy("part")
  }

  /** The oracle row pins iterations = 2, where the synthetic
    * co-purchase graph still HAS community structure to hash (2 / 41 /
    * hundreds of communities across the SFs) — the graph is dense
    * enough that the min-label dynamics legitimately coarsen toward
    * the per-component fixed point by round 3–5 (measured: one
    * community at 5), which would verify only the collapse. The API
    * default stays 5 (the C16 parameterize-for-action precedent).
    * Iteration CTEs are MATERIALIZED: it_k feeds three consumers, and
    * DuckDB's default inlining re-expands the chain exponentially
    * (file-handle exhaustion by depth 5). */
  val qCommunities: Q = Q(
    "q_communities",
    (s, d) => communities(Tables.lineitem(s, d), iterations = 2),
    Some {
      val OracleIters = 2
      val its = (1 to OracleIters).map { k =>
        s"""v$k AS MATERIALIZED (SELECT e.d AS node, l.label
            FROM it${k - 1} l JOIN e ON l.node = e.s
          UNION ALL SELECT node, label FROM it${k - 1}),
        c$k AS MATERIALIZED (SELECT node, label, count(*) AS cnt
          FROM v$k GROUP BY 1, 2),
        m$k AS MATERIALIZED (SELECT node, max(cnt) AS mc FROM c$k GROUP BY 1),
        it$k AS MATERIALIZED (SELECT c.node, min(c.label) AS label
          FROM c$k c JOIN m$k m ON c.node = m.node AND c.cnt = m.mc
          GROUP BY 1)"""
      }.mkString(",\n        ")
      s"""WITH li AS MATERIALIZED (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      e0 AS MATERIALIZED (SELECT DISTINCT a.p AS u, b.p AS v
        FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
      e AS MATERIALIZED (
        SELECT u AS s, v AS d FROM e0 UNION ALL SELECT v, u FROM e0),
      it0 AS MATERIALIZED (SELECT node, node AS label FROM (
        SELECT DISTINCT s AS node FROM e UNION SELECT DISTINCT d FROM e)),
      $its,
      sizes AS (SELECT label, count(*) AS community_size
        FROM it$OracleIters GROUP BY 1)
      SELECT i.node AS part, i.label AS community,
        CAST(s.community_size AS BIGINT) AS community_size
      FROM it$OracleIters i JOIN sizes s ON i.label = s.label
      ORDER BY part"""
    })

  val all: Seq[Q] = Seq(qPageRank, qTriangles, qCommunities)
}
