package graft

import org.apache.spark.sql.functions._

class KnnLabelSpec extends SparkSpec {

  test("knnLabelIvf: cleanly separable clusters classify perfectly") {
    import spark.implicits._
    // two orthogonal clusters with per-vector jitter; ids interleave so
    // the first-10-vectors centroids cover both labels
    val vecs = (0 until 30).map { i =>
      val label = i % 2
      val e =
        if (label == 0) Array(10.0f, 0.0f, 0.01f * i)
        else Array(0.0f, 10.0f, 0.01f * i)
      (i.toLong, e, label)
    }
    val df = vecs.toDF("vec_id", "embedding", "label")
    val got = Graft.knnLabelIvf(df, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((0L, 15L, 15L), (1L, 15L, 15L)))
  }

  test("knnLabelIvf majority vote breaks ties toward the smaller label") {
    import spark.implicits._
    // query 20 sits exactly between one label-0 and one label-1 vector:
    // with k=2 the vote is 1–1 and label 0 must win the tie
    val df = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(0.0f, 1.0f), 1),
      (20L, Array(1.0f, 1.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val got = Graft.knnLabelIvf(df, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // vec 20 (true label 1) votes 1–1 and predicts 0 via the tie; vec 1
    // does the same — label 1 evaluates 2 with 0 correct. vec 0's two
    // neighbors are both label 1, so label 0 is 0/1 as well.
    assert(got == Set((0L, 1L, 0L), (1L, 2L, 0L)))
  }
}
