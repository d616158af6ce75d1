package graft

import graft.queries.{Dedup, Splits}

/** H12 [[graft.queries.Splits]]: deterministic source-keyed
  * train/val/test assignment and the cross-split near-dup leakage
  * audit. */
class SplitsSpec extends SparkSpec {
  import spark.implicits._

  test("assignment is a function of source alone; thresholds partition buckets") {
    val asg = Splits.splitAssign(Tables.documents(spark, sfDir), 40, 56)
      .collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    // one split per source — the group-splitting invariant
    val bySource = asg.groupBy(_._2).view.mapValues(_.map(_._4).toSet)
    assert(bySource.values.forall(_.size == 1), bySource.toMap)
    // threshold semantics
    assert(asg.forall { case (_, _, b, s) =>
      s == (if (b < 40) "train" else if (b < 96) "val" else "test")
    })
    // the oracle-row params must populate all three splits (corpus action)
    assert(asg.map(_._4).toSet == Set("train", "val", "test"))
  }

  test("planted cross-split near-dup is flagged; same-split twin is not") {
    // derive two source names that land in different splits under the
    // chosen thresholds, and two that land in the same split —
    // data-driven so the test doesn't hardcode hash values
    val probe = (0 until 40).map(i => (i.toLong, "text", s"site$i")).toDF("doc_id", "text", "source")
    val buckets = Splits.splitAssign(probe, 50, 25).collect()
      .map(r => (r.getString(1), r.getLong(2))).toMap
    val train = buckets.collect { case (s, b) if b < 50 => s }.toSeq.sorted
    val test_ = buckets.collect { case (s, b) if b >= 75 => s }.toSeq.sorted
    assert(train.size >= 2 && test_.nonEmpty, buckets)

    val near = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, near, train.head),
      (2L, near + " lambda", test_.head),  // near-dup, crosses split
      (3L, near + " mu", train(1)),        // near-dup, both train
      (4L, "completely different words entirely unrelated content here", test_.head))
      .toDF("doc_id", "text", "source")
    val leaks = Splits.splitLeakage(docs, 50, 25).collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    assert(leaks.map(l => (l._1, l._3)).toSet == Set((1L, 2L), (2L, 3L)), leaks)
    assert(leaks.forall(l => l._2 != l._4), leaks)
  }

  test("leakage = exactly the D2 pairs whose labels differ (differential)") {
    val docs = Tables.documents(spark, sfDir)
    val labels = Splits.splitAssign(docs, 40, 56).collect()
      .map(r => (r.getLong(0), r.getString(3))).toMap
    val allPairs = Dedup.minhashPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expected = allPairs.filter { case (a, b) => labels(a) != labels(b) }.sorted
    val got = Splits.splitLeakage(docs, 40, 56).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq.sorted
    assert(got == expected, s"got ${got.size}, expected ${expected.size}")
    assert(got.nonEmpty, "premise: corpus must have cross-split near-dups")
  }

  test("assignment is repartition-invariant and engine-deterministic") {
    val docs = Tables.documents(spark, sfDir)
    val a = Splits.splitAssign(docs, 90, 5).collect().toSeq
    val b = Splits.splitAssign(docs.repartition(17), 90, 5).collect().toSeq
    assert(a == b)
  }
}
