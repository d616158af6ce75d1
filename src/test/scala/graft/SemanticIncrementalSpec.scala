package graft

import graft.queries.Similarity
import graft.sources.Sinks
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** D28 [[Similarity.semanticDedupIncremental]]: the restricted
  * batch-sided probe equals FULL SemDeDup over the union (filtered to
  * batch ids) under the same frozen cells; the per-cell store chain
  * replays the direct path; the id-disjointness guard fires under ANY
  * projection (the advisor-hardened fold). */
class SemanticIncrementalSpec extends SparkSpec {
  import spark.implicits._

  /** Synthetic 8-dim embeddings around 6 base directions; every 10th
    * vector is a tight near-dup of its base so pairs actually cross
    * the threshold, and ids interleave lake (≡0 mod 3) and batch. */
  private lazy val emb: DataFrame = {
    val rnd = new scala.util.Random(7)
    val base = Array.tabulate(6)(_ => Array.fill(8)(rnd.nextGaussian()))
    (0 until 120).map { i =>
      val b = base(i % 6)
      val s = if (i % 10 == 0) 0.01 else 0.6
      (i.toLong, b.map(x => (x + rnd.nextGaussian() * s).toFloat))
    }.toDF("vec_id", "embedding")
  }

  private def lake = emb.filter(col("vec_id") % 3 === 0)
  private def batch = emb.filter(col("vec_id") % 3 =!= 0)

  private def rows(df: DataFrame): Seq[(Long, Long, Double, Long)] =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq

  test("restricted probe == full SemDeDup over the union, filtered to batch ids") {
    val inc = rows(Similarity.semanticDedupIncremental(
      batch, lake, cells = 5, minCosine = 0.6))
    val cents = Similarity.fitSemanticCells(lake, 5, 0xC0FFEEL, 1.0, "spec")
    val full = rows(Similarity.semanticDedupFrozen(emb, cents, 0.6)
      .filter(col("vec_id") % 3 =!= 0))
    assert(inc == full,
      "batch-sided pair enumeration diverged from full union SemDeDup")
    // the probe actually bites: some batch row drops, and only batch
    // ids appear in the output
    assert(inc.exists(_._4 == 0L), "planted near-dups must drop something")
    assert(inc.forall(_._1 % 3 != 0L), "lake rows must never be re-flagged")
  }

  test("batch×lake pairs flag in BOTH id orientations") {
    // cell 0: lake 3 and batch 4 share a vector — the LAKE-lower pair
    // (3,4) ties on c_cos and the loser rule drops the larger id, the
    // batch one. cell 1: batch 8 sits exactly on the centroid between
    // lake 9 and 15 — the BATCH-lower pairs (8,9)/(8,15) have the
    // batch member more central, so batch 8 drops. Both enumeration
    // branches must fire for both kept bits to be 0.
    val u = Array(1f, 0f, 0f, 0f)
    val w1 = Array(0f, 1f, 0.1f, 0f)
    val w2 = Array(0f, 1f, -0.1f, 0f)
    val wm = Array(0f, 1f, 0f, 0f)
    val local = Seq((3L, u), (4L, u), (9L, w1), (15L, w2), (8L, wm))
      .toDF("vec_id", "embedding")
    val cents = Seq(
      (0L, Array(1.0, 0.0, 0.0, 0.0), 1.0),
      (1L, Array(0.0, 1.0, 0.0, 0.0), 1.0))
    val lk = local.filter(col("vec_id") % 3 === 0)
    val bt = local.filter(col("vec_id") % 3 =!= 0)
    val out = rows(Similarity.semanticDedupIncrementalAssigned(
      bt, Similarity.assignSemanticCellsFrozen(lk, cents), cents,
      minCosine = 0.9))
    val kept = out.map(r => r._1 -> r._4).toMap
    assert(kept(4L) == 0L, "lake-lower pair (3,4) must drop batch 4")
    assert(kept(8L) == 0L, "batch-lower pairs (8,9)/(8,15) must drop batch 8")
  }

  test("per-cell store chain replays the direct path") {
    val dir = java.nio.file.Files.createTempDirectory("cellstore").toString
    val cents = Similarity.fitSemanticCells(lake, 5, 0xC0FFEEL, 1.0, "spec")
    // the lake lands in two appends (two historical batches)
    Sinks.appendCellVectors(Similarity.assignSemanticCellsFrozen(
      lake.filter(col("vec_id") < 60), cents), dir)
    Sinks.appendCellVectors(Similarity.assignSemanticCellsFrozen(
      lake.filter(col("vec_id") >= 60), cents), dir)
    val stored = Sinks.readCellVectors(spark, dir)
    val viaStore = rows(Similarity.semanticDedupIncrementalAssigned(
      batch, stored, cents, minCosine = 0.6))
    val direct = rows(Similarity.semanticDedupIncremental(
      batch, lake, cells = 5, minCosine = 0.6))
    assert(viaStore == direct,
      "the parquet store chain must replay the direct in-memory path")
  }

  test("an empty store (fresh lake) flags only batch-internal pairs") {
    val dir = java.nio.file.Files.createTempDirectory("cellstore_empty").toString
    val cents = Similarity.fitSemanticCells(lake, 5, 0xC0FFEEL, 1.0, "spec")
    val empty = Sinks.readCellVectors(spark, dir)
    val out = rows(Similarity.semanticDedupIncrementalAssigned(
      batch, empty, cents, minCosine = 0.6))
    val selfOnly = rows(Similarity.semanticDedupFrozen(batch, cents, 0.6))
    assert(out == selfOnly,
      "with no lake, the incremental pass must equal plain frozen SemDeDup of the batch")
  }

  test("overlapping vec_ids fail loudly even under a vec_id-only projection") {
    val clashLake = emb.filter(col("vec_id") < 20)
    val clashBatch = emb.filter(col("vec_id") < 25) // ids 0..19 overlap
    val ex = intercept[Exception] {
      Similarity.semanticDedupIncremental(clashBatch, clashLake,
        cells = 3, minCosine = 0.6)
        .select("vec_id").collect() // prunes every other column
    }
    assert(ex.getMessage != null &&
      ex.getMessage.contains("must be disjoint"), ex.getMessage)
  }
}
