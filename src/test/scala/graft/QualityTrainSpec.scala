package graft

import graft.queries.{DocEmbed, QualityTrain}

/** C22 [[graft.queries.QualityTrain]]: the batch perceptron's
  * trajectory must match a local single-threaded reference run
  * exactly, converge on separable planted data, and be
  * partitioning-invariant (the commutative-update property that
  * justifies full-batch over SGD). */
class QualityTrainSpec extends SparkSpec {
  import spark.implicits._

  private def trajectory(df: org.apache.spark.sql.DataFrame) =
    df.collect().toSeq.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  test("matches a local reference perceptron exactly on the corpus") {
    val docs = Tables.documents(spark, sfDir)
    val dims = 8
    val iters = 4
    val got = trajectory(QualityTrain.trainQualityModel(docs, dims, iters))

    // local reference: collect labeled features, run the same loop
    val labels = QualityTrain.gateLabels(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val feats = DocEmbed.docEmbed(docs, dims).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    var w = (-1L until dims.toLong).map(_ -> 0L).toMap
    val expect = Seq.newBuilder[(Long, Long, Long, Long)]
    for (t <- 1 to iters) {
      val mistaken = labels.keys.toSeq.filter { id =>
        val f = feats.getOrElse(id, Map.empty) + (-1L -> 1L)
        val score = f.map { case (d, q) => w(d) * q }.sum
        labels(id) * score <= 0L
      }
      val delta = mistaken
        .flatMap { id =>
          (feats.getOrElse(id, Map.empty) + (-1L -> 1L))
            .map { case (d, q) => d -> labels(id) * q }
        }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      w = w.map { case (d, v) => d -> (v + delta.getOrElse(d, 0L)) }
      w.toSeq.sortBy(_._1).foreach { case (d, v) =>
        expect += ((t.toLong, d, v, mistaken.size.toLong))
      }
    }
    assert(got == expect.result(), s"got ${got.take(5)}…")
  }

  test("separable planted labels converge to zero mistakes and freeze") {
    // two disjoint vocabularies -> disjoint hash dims -> linearly
    // separable; enough docs that the margin survives the bias term
    val good = (0L until 20L).map(i => (i, "alpha beta gamma delta " * 12))
    val bad = (100L until 120L).map(i => (i, "zz qq xx" ))
    val docs = (good ++ bad).toDF("doc_id", "text")
    val traj = trajectory(QualityTrain.trainQualityModel(docs, 8, 8))
    val mistakes = traj.groupBy(_._1).view.mapValues(_.head._4).toMap
    assert(mistakes(1L) == 40L, mistakes) // zero-init: everything mistaken
    assert(mistakes(8L) == 0L, mistakes)  // converged
    // after the first zero-mistake round, weights never change again
    val firstZero = mistakes.filter(_._2 == 0L).keys.min
    val wAt = (t: Long) => traj.filter(_._1 == t).map(r => (r._2, r._3)).sorted
    ((firstZero + 1) to 8L).foreach(t => assert(wAt(t) == wAt(firstZero)))
  }

  test("trajectory is partitioning-invariant (commutative batch update)") {
    val docs = Tables.documents(spark, sfDir)
    val a = trajectory(QualityTrain.trainQualityModel(docs, 8, 3))
    val b = trajectory(QualityTrain.trainQualityModel(docs.repartition(23), 8, 3))
    assert(a == b)
  }
}
