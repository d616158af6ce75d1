package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration synchronous label propagation (Raghavan et al. '07)
  * over an edge list — community detection, the third classic beside
  * [[ConnectedComponents]] (membership) and [[PageRank]] (centrality):
  * partition a co-purchase / co-citation / link graph into densely
  * connected groups. Training-data uses: domain clustering for mix
  * design, near-dup cluster refinement, spam-farm isolation.
  *
  * Deterministic variant (the oracle contract): every node votes its
  * own CURRENT label plus each in-neighbor's label (the self-vote is
  * the standard damping that keeps bipartite structures from
  * oscillating under synchronous updates); the new label is the vote
  * with the HIGHEST count, ties broken by the SMALLEST label. All
  * arithmetic is integer counts on integer labels — bit-identical
  * under retries/speculation and replayable as chained SQL CTEs (the
  * [[PageRank]] precedent). A fixed iteration budget replaces a
  * convergence probe, matching how production community jobs pin cost;
  * disjoint cliques converge in ONE round (all counts tie at 1 and
  * every member picks the clique minimum).
  *
  * Scale shape per iteration: one equi-join of the (node, label) frame
  * onto the edge list (both 16-byte-narrow; the label side broadcasts
  * below `broadcastLabelsBelow` nodes, so the pinned edge blocks never
  * move — the [[PageRank]] dense-graph lesson), one map-side-combinable
  * (node, label) count, a (node) max-count agg, and the deterministic
  * argmin join — every shuffle keyed by node. A tracked
  * `localCheckpoint` per round keeps lineage O(1) ([[Checkpoints]]);
  * the materializing count doubles as the release point for the
  * superseded round. Nothing collects to the driver.
  */
object LabelPropagation {

  /** Propagate labels over the DIRECTED vote graph `edges` (a node
    * receives votes along in-edges; pass both directions for an
    * undirected graph). Labels start as the node ids.
    *
    * @return (node: long, label: long), one row per distinct endpoint
    */
  def propagate(
      edges: DataFrame,
      src: String = "src",
      dst: String = "dst",
      iterations: Int = 5,
      broadcastEdgesBelow: Long = 1000000L,
      broadcastLabelsBelow: Long = 1000000L): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    import Checkpoints.{tracked, release}
    val (eCk, eRdd) = tracked(edges
      .select(col(src).cast("long").as("s"), col(dst).cast("long").as("d"))
      .filter(col("s").isNotNull && col("d").isNotNull)
      .distinct())
    val eCount = eCk.count()
    if (eCount == 0L) {
      release(eRdd)
      return edges.sparkSession.range(0)
        .select(col("id").as("node"), col("id").as("label"))
    }
    val e = if (eCount <= broadcastEdgesBelow) broadcast(eCk) else eCk
    val nodes = e.select(col("s").as("node"))
      .union(e.select(col("d").as("node"))).distinct()
    val n = nodes.count()
    var labels = nodes.select(col("node"), col("node").as("label"))
    var labelsRdd: Checkpoints.CkRdd = None
    for (_ <- 1 to iterations) {
      val neighborVotes =
        if (n <= broadcastLabelsBelow)
          eCk.join(broadcast(labels), col("node") === col("s"))
        else labels.join(e, col("node") === col("s"))
      val votes = neighborVotes
        .select(col("d").as("node"), col("label"))
        .unionByName(labels.select(col("node"), col("label")))
      val counts = votes.groupBy("node", "label").agg(count(lit(1)).as("cnt"))
      // deterministic argmax in two combinable phases (a packed-long
      // single agg would bound the label domain; a struct max would
      // plan SortAggregate — the D15 lesson): max count per node, then
      // the smallest label attaining it
      val best = counts.groupBy("node").agg(max(col("cnt")).as("mc"))
      val next = counts.join(best, Seq("node"))
        .filter(col("cnt") === col("mc"))
        .groupBy("node").agg(min(col("label")).as("label"))
      val (ck, ckRdd) = tracked(next)
      ck.count() // materializes ck; superseded round now releasable
      release(labelsRdd)
      labels = ck
      labelsRdd = ckRdd
    }
    release(eRdd)
    labels
  }
}
