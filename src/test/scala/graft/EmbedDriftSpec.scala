package graft

/** I5 [[graft.queries.Profile.embedDrift]] on planted snapshots: exact
  * Chebyshev shifts, one-sided labels, the zero case, and partitioning
  * invariance. Planted components are 1/4096 multiples so quantization
  * is exact and the expected shifts are exact doubles. */
class EmbedDriftSpec extends SparkSpec {
  import spark.implicits._

  private def emb(rows: Seq[(Long, Seq[Float], Int)]) =
    rows.toDF("vec_id", "embedding", "label")

  private def drift(a: Seq[(Long, Seq[Float], Int)], b: Seq[(Long, Seq[Float], Int)]) =
    Graft.embedDrift(emb(a), emb(b)).collect().map { r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))
    }.toMap

  test("planted centroid shift is exact; identical label reports zero") {
    val a = Seq(
      (1L, Seq(0f, 0f), 1), (2L, Seq(1f, 0f), 1), // label 1 centroid (0.5, 0)
      (3L, Seq(0.25f, 0.25f), 2))                 // label 2 centroid (.25,.25)
    val b = Seq(
      (4L, Seq(1f, 0f), 1), (5L, Seq(2f, 0f), 1), // label 1 centroid (1.5, 0)
      (6L, Seq(0.25f, 0.25f), 2))                 // unchanged
    val out = drift(a, b)
    assert(out(1L) == (2L, 2L, Some(1.0)))
    assert(out(2L) == (1L, 1L, Some(0.0)))
  }

  test("shift is the max over dims, not the sum") {
    val a = Seq((1L, Seq(0f, 0f, 0f), 7))
    val b = Seq((2L, Seq(0.5f, -2f, 0.25f), 7))
    assert(drift(a, b)(7L) == (1L, 1L, Some(2.0)))
  }

  test("a label present in only one snapshot reports a null shift") {
    val a = Seq((1L, Seq(1f, 1f), 1), (2L, Seq(0f, 0f), 9))
    val b = Seq((3L, Seq(1f, 1f), 1))
    val out = drift(a, b)
    assert(out(9L) == (1L, 0L, None))
    assert(out(1L) == (1L, 1L, Some(0.0)))
  }

  test("drift is partitioning-invariant on real embeddings") {
    val e = Tables.embeddings(spark, sfDir)
    import org.apache.spark.sql.functions.col
    val a = e.filter(col("vec_id") % 2 === 0)
    val b = e.filter(col("vec_id") % 2 === 1)
    val one = Graft.embedDrift(a, b).collect().toSeq
    val many = Graft.embedDrift(a.repartition(11), b.repartition(5)).collect().toSeq
    assert(one == many)
  }
}
