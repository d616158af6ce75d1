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
    // one stats job: node count (broadcast-vs-join switch) + max node
    // id (labels are always a subset of the initial node ids — votes
    // carry existing labels and the argmax picks one — so the id bound
    // decides once whether the packed argmax below is in domain)
    val statsRow = nodes.agg(count(lit(1)), max(col("node")), min(col("node"))).head()
    val n = statsRow.getLong(0)
    val maxId = if (statsRow.isNullAt(1)) 0L else statsRow.getLong(1)
    val minId = if (statsRow.isNullAt(2)) 0L else statsRow.getLong(2)
    // Packed argmax domain: label < 2^40 and per-node vote count
    // < 2^23 fit `cnt·2^40 − label` in a positive long, and maximizing
    // it IS maximizing (cnt ASC-packed, label DESC-packed) — i.e. max
    // count, ties to the SMALLEST label, the exact two-phase result.
    // One combinable HashAggregate replaces the max-count agg + join +
    // min-label agg (one exchange and a join fewer per round); graphs
    // with ids past 2^40 keep the two-phase plan (no domain bound on
    // the operator's contract). The count bound is guarded in-plan —
    // a node with ≥ 2^23 votes fails loudly, never corrupts the pack.
    val PackBits = 40
    val packedOk = minId >= 0L && maxId < (1L << PackBits)
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
      val next =
        if (packedOk) {
          val cntGuard = coalesce(
            assert_true(col("cnt") < (1L << (63 - PackBits)),
              lit("LabelPropagation: a node's vote count exceeds the " +
                "2^23 packed-argmax domain")).cast("long"), lit(0L))
          val packed = (col("cnt") + cntGuard) * (1L << PackBits) - col("label")
          counts.groupBy("node").agg(max(packed).as("p"))
            // p = c·2^40 − label with 0 ≤ label < 2^40, so
            // label ≡ −p (mod 2^40) — exact integer unpack
            .select(col("node"),
              pmod(lit(0L) - col("p"), lit(1L << PackBits)).as("label"))
        } else {
          // two combinable phases (the pre-r15 plan): max count per
          // node, then the smallest label attaining it
          val best = counts.groupBy("node").agg(max(col("cnt")).as("mc"))
          counts.join(best, Seq("node"))
            .filter(col("cnt") === col("mc"))
            .groupBy("node").agg(min(col("label")).as("label"))
        }
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
