package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** D15 [[graft.queries.Similarity.semanticDedup]] on planted frames:
  * the SemDeDup keep rule (drop the pair member closer to its
  * centroid), within-cluster scoping, and determinism. */
class SemanticDedupSpec extends SparkSpec {

  private val dims = 8

  /** Unit-ish vectors: a base direction per "cluster" plus a small
    * deterministic per-id perturbation on another axis. */
  private def vec(axis: Int, eps: Double, epsAxis: Int): Seq[Float] =
    (0 until dims).map(i =>
      (if (i == axis) 1.0f else 0.0f) +
        (if (i == epsAxis) eps.toFloat else 0.0f)).toSeq

  private def frame(rows: Seq[(Long, Seq[Float])]) = {
    val schema = StructType(Seq(StructField("vec_id", LongType, false),
      StructField("embedding", ArrayType(FloatType, false), false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, e) => Row(id, e) }, 3),
      schema)
  }

  test("near-identical vectors in one cluster: the centroid-closer one drops") {
    // centroids are vec_id < 2: id 0 spans axis 0, id 1 spans axis 1.
    // ids 10 and 11 both sit on axis 0 (cluster 0); id 10 is EXACTLY
    // the centroid direction, id 11 is slightly off-axis -> cos(10,11)
    // ~ 0.995 >= 0.9, and id 10 (closer to the centroid) must drop.
    val rows = Seq(
      0L -> vec(0, 0.0, 1), 1L -> vec(1, 0.0, 2),
      10L -> vec(0, 0.0, 3), 11L -> vec(0, 0.1, 3),
      20L -> vec(1, 0.1, 4)) // cluster 1, no near-dup partner
    val out = Graft.semanticDedup(frame(rows), cells = 2, minCosine = 0.9)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(10L) == 0L, s"centroid-closest dup must drop: $out")
    assert(out(11L) == 1L && out(20L) == 1L, out)
    assert(out(0L) == 0L || out(0L) == 1L) // centroid rows are ordinary members
  }

  test("cross-cluster near-dups are NOT dropped (SemDeDup contract)") {
    // ids 10 and 20 are nearly parallel but land in different clusters
    // (each sits on its own centroid's axis with a small shared tilt);
    // semanticDedup must not compare them
    val rows = Seq(
      0L -> vec(0, 0.0, 1), 1L -> vec(1, 0.0, 2),
      10L -> vec(0, 0.05, 3), 20L -> vec(1, 0.05, 3))
    val out = Graft.semanticDedup(frame(rows), cells = 2, minCosine = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    val cellOf = out.map(t => t._1 -> t._2).toMap
    assert(cellOf(10L) != cellOf(20L), s"test premise: different cells, got $out")
    assert(out.filter(t => t._1 >= 10L).forall(_._3 == 1L), out)
  }

  test("exact duplicate pair: tie on centroid cosine keeps the smaller id") {
    val rows = Seq(
      0L -> vec(0, 0.0, 1), 1L -> vec(1, 0.0, 2),
      10L -> vec(0, 0.1, 3), 11L -> vec(0, 0.1, 3))
    val out = Graft.semanticDedup(frame(rows), cells = 2, minCosine = 0.9)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(10L) == 1L && out(11L) == 0L, out)
  }

  test("auto cell sizing equals an explicit ceil(sqrt(N)) run") {
    // 60 vectors -> auto k = ceil(sqrt(60)) = 8; the unset-cells call
    // must produce exactly the cells=8 plan's output
    val rows = (0L until 60L).map(i =>
      i -> vec((i % 4).toInt, 0.01 * (i % 7), (4 + i % 4).toInt))
    val auto = Graft.semanticDedup(frame(rows), minCosine = 0.95).collect().toSeq
    val explicit = Graft.semanticDedup(frame(rows), cells = 8,
      minCosine = 0.95).collect().toSeq
    assert(auto == explicit && auto.size == 60)
    assert(auto.map(_.getLong(1)).distinct.size > 1, "auto sizing must use >1 cell")
  }

  test("a sparse/offset id space still yields k centroids and one row per vector") {
    // the first cut selected centroids with `vec_id < k`: a frame whose
    // ids start above k (a filtered slice, a sharded partition)
    // silently got ZERO centroids and returned an EMPTY result. The
    // rank-keyed selection must be id-space independent: shifting every
    // id by a constant changes nothing but the reported vec_ids.
    val rows = (0L until 60L).map(i =>
      i -> vec((i % 4).toInt, 0.01 * (i % 7), (4 + i % 4).toInt))
    val base = Graft.semanticDedup(frame(rows), cells = 4, minCosine = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq
    val shifted = Graft.semanticDedup(
        frame(rows.map { case (id, v) => (id + 1000000L) -> v }),
        cells = 4, minCosine = 0.95)
      .collect().map(r => (r.getLong(0) - 1000000L, r.getLong(1), r.getLong(3))).toSeq
    assert(shifted.size == 60, s"expected 60 rows, got ${shifted.size}")
    assert(base == shifted, "dedup decisions must not depend on raw id magnitude")
  }

  test("deterministic and partitioning-invariant; kept+dropped partition the corpus") {
    val rows = (0L until 60L).map(i =>
      i -> vec((i % 4).toInt, 0.01 * (i % 7), (4 + i % 4).toInt))
    val a = Graft.semanticDedup(frame(rows).repartition(1), cells = 4,
      minCosine = 0.95).collect().toSeq
    val b = Graft.semanticDedup(frame(rows).repartition(7), cells = 4,
      minCosine = 0.95).collect().toSeq
    assert(a == b && a.size == 60)
    assert(a.map(_.getLong(3)).forall(k => k == 0L || k == 1L))
    assert(a.map(_.getLong(3)).sum < 60, "some rows must drop")
    graft.ops.Release.sweep(spark)
  }

  test("trained centroids: planted twins still resolve, exactly one of each pair drops") {
    // 4 axis clusters, 15 vectors each with a per-member-UNIQUE tilt
    // (0.03 spacing keeps every within-cluster base pair's cosine
    // under 0.9997), plus one near-identical pair planted per cluster
    // (ids 100+c and 200+c share the direction of cluster c with
    // tilts 0.001/0.002 — cosine ~ 1-1e-7). At minCosine 0.9999 the
    // planted pairs are the ONLY qualifying pairs whatever cell
    // boundaries the fit draws, so exactly 4 rows drop — and each
    // pair must land in one trained cell for the drop to happen.
    val rows = (0L until 60L).map(i =>
      i -> vec((i % 4).toInt, 0.03 * (i / 4 + 1), (4 + i % 4).toInt)) ++
      (0 until 4).flatMap(c => Seq(
        (100L + c) -> vec(c, 0.001, 4 + c),
        (200L + c) -> vec(c, 0.002, 4 + c)))
    val out = Graft.semanticDedupTrained(frame(rows), cells = 4,
      minCosine = 0.9999).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(out.length == 68, s"one row per vector, got ${out.length}")
    val cellOf = out.map(t => t._1 -> t._2).toMap
    val keptOf = out.map(t => t._1 -> t._3).toMap
    (0 until 4).foreach { c =>
      assert(cellOf(100L + c) == cellOf(200L + c),
        s"planted twins of cluster $c must share a trained cell: $cellOf")
      assert(keptOf(100L + c) + keptOf(200L + c) == 1L,
        s"exactly one twin of cluster $c must drop: $keptOf")
    }
    assert(out.map(_._3).sum == 64L, s"only the 4 planted twins drop: $out")
  }

  test("trained run is deterministic for a fixed seed and matches across partitionings") {
    val rows = (0L until 60L).map(i =>
      i -> vec((i % 4).toInt, 0.01 * (i % 7), (4 + i % 4).toInt))
    val a = Graft.semanticDedupTrained(frame(rows).repartition(1), cells = 3,
      minCosine = 0.95).collect().toSeq
    val b = Graft.semanticDedupTrained(frame(rows).repartition(1), cells = 3,
      minCosine = 0.95).collect().toSeq
    assert(a == b && a.size == 60, "same seed, same partitioning => identical output")
    graft.ops.Release.sweep(spark)
  }
}
