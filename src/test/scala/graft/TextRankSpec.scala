package graft

import graft.queries.TextRank

/** C24 [[TextRank.textRank]]: hub words outrank leaves, the window
  * bounds co-occurrence, and ranks are partitioning-invariant. */
class TextRankSpec extends SparkSpec {
  import spark.implicits._

  test("a hub word co-occurring with everything ranks first") {
    // "hub" appears adjacent to every other word; leaves only touch
    // the hub and their neighbors
    val docs = Seq(
      (1L, "hub alpha hub beta hub gamma"),
      (2L, "hub delta hub epsilon"),
      (3L, "alpha beta"))
      .toDF("doc_id", "text")
    val out = TextRank.textRank(docs, k = 10).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(out.head._1 == "hub", s"hub must rank first: ${out.toSeq}")
    // every term appears once; ranks strictly ordered by the output
    assert(out.map(_._1).distinct.length == out.length)
    assert(out.map(_._2).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }

  test("window bounds co-occurrence: distant words share no edge") {
    // with window 1 only adjacent words connect: "far" touches only
    // "mid", never "near" — a 3-node path, ends tie below the middle
    val docs = Seq((1L, "near mid far")).toDF("doc_id", "text")
    val out = TextRank.textRank(docs, window = 1, k = 10).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("mid") > out("near") && out("near") == out("far"), out.toString)
  }

  test("partitioning invariance on the corpus") {
    val docs = Tables.documents(spark, sfDir)
    val a = TextRank.textRank(docs).collect().map(_.toSeq).toSeq
    val b = TextRank.textRank(docs.repartition(11)).collect().map(_.toSeq).toSeq
    assert(a == b, "textRank must not depend on partitioning")
    assert(a.nonEmpty)
  }
}
