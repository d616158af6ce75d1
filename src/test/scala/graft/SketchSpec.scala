package graft

import graft.queries.Sketches
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** I10 [[Sketches.heavyHitters]] / I11 [[Sketches.corpusOverlap]]:
  * the CMS prefilter must return EXACTLY the naive aggregation
  * (losslessness — including under an adversarially tiny sketch where
  * every key collides), and the KMV estimator must hit its exact
  * endpoints (identical → 1, disjoint → 0, k ≥ union → estimate ==
  * exact) and stay a valid [0,1] estimate in between.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: Seq[String]): DataFrame =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  private def naiveHeavy(df: DataFrame, minCount: Long, n: Int) = {
    import graft.functions.TextFunctions._
    df.select(explode(shingles(words(col("text")), n)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
  }

  test("heavy hitters == naive aggregation at production width") {
    val df = docs(Seq(
      "the cat sat on the mat", "the cat sat on a hat",
      "the cat ran off the mat", "a dog sat on the mat",
      "the cat sat quietly"))
    val got = Sketches.heavyHitters(df, minCount = 2L, n = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == naiveHeavy(df, 2L, 2))
    assert(got.contains(("the cat", 4L)))
    assert(got.contains(("cat sat", 3L)))
    assert(!got.exists(_._1 == "dog sat"), "count-1 gram must not pass")
  }

  test("adversarial width=16: everything collides, output still exact") {
    // 40 distinct unigrams, a few heavy — a 16-bucket sketch forces
    // collisions everywhere; estimates inflate, output must not change
    val texts = (0 until 40).map(i => s"w$i") ++
      Seq.fill(5)("hot") ++ Seq.fill(3)("warm")
    val df = docs(texts.grouped(8).map(_.mkString(" ")).toSeq)
    for (depth <- Seq(1, 3)) {
      val got = Sketches.heavyHitters(df, minCount = 3L, n = 1,
        depth = depth, width = 16)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == naiveHeavy(df, 3L, 1), s"depth=$depth")
      assert(got.contains(("hot", 5L)) && got.contains(("warm", 3L)))
    }
  }

  test("threshold boundary: count == minCount kept, count+1 threshold drops it") {
    val df = docs(Seq("x x x y y"))
    val at = Sketches.heavyHitters(df, minCount = 3L, n = 1)
      .collect().map(_.getString(0)).toSet
    assert(at == Set("x"))
    val above = Sketches.heavyHitters(df, minCount = 4L, n = 1)
      .collect().map(_.getString(0)).toSet
    assert(above == Set.empty[String])
  }

  test("empty / null / short-doc input yields no rows and no failure") {
    val df = Seq((0L, null: String), (1L, ""), (2L, "solo"))
      .toDF("doc_id", "text")
    // n=2 grams: no doc has 2 tokens
    assert(Sketches.heavyHitters(df, 1L, n = 2).count() == 0L)
    // n=1: "solo" appears once
    val got = Sketches.heavyHitters(df, 1L, n = 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("solo", 1L)))
  }

  test("heavyHitters rejects bad parameters") {
    val df = docs(Seq("a"))
    intercept[IllegalArgumentException](Sketches.heavyHitters(df, 0L))
    intercept[IllegalArgumentException](Sketches.heavyHitters(df, 1L, n = 0))
    intercept[IllegalArgumentException](
      Sketches.heavyHitters(df, 1L, depth = 0))
    intercept[IllegalArgumentException](
      Sketches.heavyHitters(df, 1L, width = 100)) // not a power of two
  }

  private def overlapRow(a: DataFrame, b: DataFrame, k: Int) = {
    val r = Sketches.corpusOverlap(a, b, k).collect()
    assert(r.length == 1)
    r(0)
  }

  test("corpusOverlap endpoints: identical -> 1, disjoint -> 0") {
    val a = docs((0 until 30).map(i => s"doc number $i"))
    val same = overlapRow(a, a, 8)
    assert(same.getAs[Double]("est_jaccard") == 1.0)
    assert(same.getAs[Double]("exact_jaccard") == 1.0)
    assert(same.getAs[Long]("k_eff") == 8L)
    val b = docs((100 until 130).map(i => s"doc number $i"))
    val dis = overlapRow(a, b, 8)
    assert(dis.getAs[Double]("est_jaccard") == 0.0)
    assert(dis.getAs[Double]("exact_jaccard") == 0.0)
    assert(dis.getAs[Long]("n_inter") == 0L)
  }

  test("k >= union makes the KMV estimate exact") {
    val a = docs((0 until 20).map(i => s"text $i"))
    val b = docs((10 until 30).map(i => s"text $i"))
    val r = overlapRow(a, b, 1000)
    assert(r.getAs[Long]("n_a") == 20L && r.getAs[Long]("n_b") == 20L)
    assert(r.getAs[Long]("n_inter") == 10L && r.getAs[Long]("n_union") == 30L)
    // sketch holds the whole union: estimator degenerates to exact
    assert(r.getAs[Long]("k_eff") == 30L)
    assert(r.getAs[Long]("sketch_inter") == 10L)
    assert(r.getAs[Double]("est_jaccard") == r.getAs[Double]("exact_jaccard"))
  }

  test("genuine estimate (k < union) stays in [0,1] with k_eff == k") {
    val a = docs((0 until 60).map(i => s"text $i"))
    val b = docs((30 until 90).map(i => s"text $i"))
    val r = overlapRow(a, b, 16)
    assert(r.getAs[Long]("k_eff") == 16L)
    val est = r.getAs[Double]("est_jaccard")
    assert(est >= 0.0 && est <= 1.0)
    assert(r.getAs[Double]("exact_jaccard") == 30.0 / 90.0)
  }

  test("null text coalesces to the empty content: identical snapshots read 1.0") {
    val a = Seq((0L, null: String), (1L, "x"), (2L, "y"))
      .toDF("doc_id", "text")
    val r = overlapRow(a, a, 100)
    // a null fingerprint would occupy a sketch slot but match no join
    // (and sort opposite ends across engines) — coalesced, the null
    // doc is the empty content and self-overlap is exactly 1
    assert(r.getAs[Long]("n_a") == 3L)
    assert(r.getAs[Double]("est_jaccard") == 1.0)
    assert(r.getAs[Double]("exact_jaccard") == 1.0)
  }

  test("set semantics: duplicate texts within a snapshot collapse") {
    val a = docs(Seq("same text", "same text", "other a"))
    val b = docs(Seq("same text", "other b"))
    val r = overlapRow(a, b, 100)
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Long]("n_inter") == 1L && r.getAs[Long]("n_union") == 3L)
  }
}
