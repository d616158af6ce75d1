package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over an edge list — the graph-centrality
  * companion to [[ConnectedComponents]]: rank suppliers/parts/documents
  * by link structure (seed-document selection, source weighting for a
  * domain mix, spam-node demotion are the training-data uses).
  *
  * INTEGER fixed-point arithmetic throughout: ranks are BIGINT
  * "micro-rank" units (initial mass [[graft.ops.PageRank.Unit]] per
  * node), per-edge contributions are integer divisions, and the
  * per-iteration sums are BIGINT — order-independent and exact, so the
  * result is bit-identical under retries/speculation AND reproducible
  * in ANSI SQL (the floating-point formulation would be
  * partition-order-dependent in its sum aggregate). The damping update
  * is `r' = (15·Unit) div 100 + (inflow + dangling div n) div 20 · 17`
  * (85% in overflow-safe divide-first form) — dangling mass
  * (out-degree-0 nodes) is redistributed uniformly, the standard
  * PageRank correction.
  *
  * Scale shape per iteration: one equi-join of the rank frame onto the
  * edge list (both (long, long)-narrow), one map-side-combinable sum by
  * destination, a broadcast of the 1-row (dangling, n) stats frame, and
  * a tracked `localCheckpoint` so lineage stays O(1) across iterations
  * ([[Checkpoints]]). The edge list with out-degrees is checkpointed
  * once and reused every round. Nothing ever collects to the driver.
  */
object PageRank {

  /** Initial integer rank mass per node. The damping step divides
    * BEFORE it multiplies (`div 20 * 17`, see below), so no
    * intermediate ever exceeds the total corpus mass n·Unit — the only
    * overflow bound is n·Unit < 2^63, i.e. ~9e9 nodes at this Unit
    * (drop Unit to trade rank resolution for node count). */
  val Unit = 1000000000L

  /** Rank every endpoint node of the directed graph `edges`.
    *
    * @param edges      frame with two integral columns `src`, `dst`;
    *                   duplicate edges collapse, null endpoints drop,
    *                   self loops count as ordinary edges
    * @param iterations fixed iteration count (deterministic output —
    *                   no convergence probe, matching how production
    *                   ranks pin the iteration budget)
    * @return (node: long, rank: long), one row per distinct endpoint
    */
  /** @param broadcastEdgesBelow edge-count threshold under which the
    *        (16-byte-row) edge list joins as a broadcast — one shuffle
    *        per iteration instead of three. AQE would make this call
    *        itself, but the checkpointed edge scan has no size estimate,
    *        so the planner assumes huge and sort-merges every round.
    *        Above the threshold every iteration shuffle-joins as usual.
    * @param broadcastRanksBelow node-count threshold under which the
    *        RANK side broadcasts instead (~24 B/row): for the common
    *        dense-graph shape (nodes ≪ edges — the sf0.1 supply graph
    *        is 21k nodes to 1.18M edges), shipping the per-iteration
    *        rank frame to the executors means the big edge list NEVER
    *        moves — each round is one map-side join over the pinned
    *        edge blocks plus the partial-agg shuffle of ≤ nodes×
    *        partitions rows. Preferred over the edge broadcast when
    *        both could fire; at web scale neither does and the
    *        shuffle join is the path. */
  def pageRank(
      edges: DataFrame,
      src: String = "src",
      dst: String = "dst",
      iterations: Int = 5,
      broadcastEdgesBelow: Long = 1000000L,
      broadcastRanksBelow: Long = 1000000L): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1") // 0 would return
    // a frame whose released checkpoint blocks can never be re-read
    import Checkpoints.{tracked, release}

    val (eCk, eRdd) = tracked(edges
      .select(col(src).cast("long").as("s"), col(dst).cast("long").as("d"))
      .filter(col("s").isNotNull && col("d").isNotNull)
      .distinct())
    val eCount = eCk.count()
    if (eCount == 0L) { // no surviving edges -> no nodes, not a 0/0 share
      release(eRdd)
      return edges.sparkSession.range(0)
        .select(col("id").as("node"), col("id").as("rank"))
    }
    val e = if (eCount <= broadcastEdgesBelow) broadcast(eCk) else eCk
    val nodes = e.select(col("s").as("node"))
      .union(e.select(col("d").as("node"))).distinct()
    // (node, out) once; every iteration's rank frame carries `out` so no
    // per-round degree join is needed
    val (deg, degRdd) = tracked(nodes
      .join(e.groupBy("s").agg(count(lit(1)).as("out")),
        nodes("node") === col("s"), "left")
      .select(col("node"), coalesce(col("out"), lit(0L)).as("out")))

    var rank = deg.withColumn("rank", lit(Unit))
    var rankRdd: Checkpoints.CkRdd = None
    // dangling mass + node count of the CURRENT rank frame. Each round
    // needs one materializing job anyway (so the superseded checkpoint
    // can be released); riding the stats on that job and folding them
    // into the next plan as literals drops a broadcast subplan and a
    // separate count job per iteration.
    def stats(df: DataFrame): (Long, Long) = {
      val r = df.agg(
        coalesce(sum(when(col("out") === 0, col("rank"))), lit(0L)),
        count(lit(1))).head()
      (r.getLong(0), r.getLong(1))
    }
    var (dm, n) = stats(rank)
    for (_ <- 1 to iterations) {
      // each contributor sends rank div out along every out-edge; the
      // zero rows keep every node present so ONE groupBy replaces the
      // groupBy + left-join-back pair (out rides along: -1 on contrib
      // rows, the real degree on each node's zero row, max() recovers it)
      val contributors = rank.filter(col("out") > 0)
      val contribs = (
        if (n <= broadcastRanksBelow)
          eCk.join(broadcast(contributors), contributors("node") === eCk("s"))
        else contributors.join(e, contributors("node") === e("s")))
        .select(col("d").as("node"), lit(-1L).as("out"),
          expr("rank div out").as("c"))
      val zeros = rank.select(col("node"), col("out"), lit(0L).as("c"))
      val share = dm / n
      // damping as `div 20 * 17` (= 85% in 20-unit steps): dividing
      // FIRST keeps the intermediate <= inflow itself, where
      // `85 * inflow` would overflow Long once one hub concentrates
      // ~1.1e17 micro-units (~1e8 nodes' mass) — well inside the
      // operator's advertised scale. Resolution cost: < 20 micro-units
      // per node per round, deterministic and mirrored in the oracle.
      val next = zeros.unionByName(contribs)
        .groupBy("node").agg(max(col("out")).as("out"), sum(col("c")).as("inflow"))
        .select(col("node"), col("out"),
          (lit(15 * Unit / 100) +
            expr(s"(inflow + ${share}L) div 20 * 17")).as("rank"))
      val (ck, ckRdd) = tracked(next)
      val s = stats(ck) // materializes ck; superseded round now releasable
      release(rankRdd)
      rank = ck
      rankRdd = ckRdd
      dm = s._1
      n = s._2
    }
    val out = rank.select(col("node"), col("rank"))
    // deg/e blocks stay pinned only through the loop; the returned frame
    // depends solely on the final checkpoint
    release(eRdd)
    release(degRdd)
    out
  }
}
