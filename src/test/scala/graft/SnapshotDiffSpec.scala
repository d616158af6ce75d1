package graft

import graft.queries.SnapshotDiff

/** Corpus snapshot diffing (SURVEY.md §2 H7) semantics. */
class SnapshotDiffSpec extends SparkSpec {

  import spark.implicits._

  test("full status taxonomy on a synthetic pair of snapshots") {
    val a = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("doc_id", "text")
    val b = Seq((2L, "beta"), (3L, "gamma changed"), (4L, "delta")).toDF("doc_id", "text")
    val got = SnapshotDiff.snapshotDiff(a, b)
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "removed", 2L -> "same", 3L -> "changed", 4L -> "added"))
  }

  test("diff of a snapshot against itself is all same") {
    val docs = Tables.documents(spark, sfDir)
    val out = SnapshotDiff.snapshotDiff(docs, docs)
    assert(out.filter($"status" =!= "same").count() == 0)
    assert(out.count() == docs.count())
  }
}
