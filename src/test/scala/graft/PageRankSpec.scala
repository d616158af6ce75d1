package graft

import graft.ops.PageRank
import org.apache.spark.sql.functions._

/** Fixed-point PageRank semantics ([[graft.ops.PageRank]]). */
class PageRankSpec extends SparkSpec {

  import spark.implicits._

  /** Local reference of the exact integer iteration. */
  private def localRank(
      edges: Seq[(Long, Long)], iterations: Int): Map[Long, Long] = {
    val e = edges.distinct
    val nodes = e.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val out = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var rank = nodes.map(_ -> PageRank.Unit).toMap
    for (_ <- 1 to iterations) {
      val dm = nodes.filter(n => !out.contains(n)).map(rank).sum
      val n = nodes.size
      val inflow = e.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => rank(s) / out(s) }.sum).toMap
      rank = nodes.map(v =>
        v -> (15 * PageRank.Unit / 100 +
          (inflow.getOrElse(v, 0L) + dm / n) / 20 * 17)).toMap
    }
    rank
  }

  private def sparkRank(
      edges: Seq[(Long, Long)], iterations: Int): Map[Long, Long] =
    PageRank.pageRank(edges.toDF("src", "dst"), iterations = iterations)
      .as[(Long, Long)].collect().toMap

  test("random directed graphs match the local integer iteration") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 3) {
      val n = 60 + trial * 30
      val edges = Seq.fill(n * 2)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      assert(sparkRank(edges, 4) == localRank(edges, 4), s"trial $trial")
    }
  }

  test("dangling mass is redistributed, not lost") {
    // star INTO node 9: 9 has no out-edges, its mass must flow back
    val edges = (0L until 5L).map(_ -> 9L)
    val got = sparkRank(edges, 3)
    assert(got == localRank(edges, 3))
    // the sink outranks its sources
    assert(got(9L) > got(0L))
    // sources stay identical by symmetry
    assert((1L until 5L).forall(i => got(i) == got(0L)))
  }

  test("authority flows: hub-linked node outranks peripheral one") {
    // every node links to 1; 1 links to 2; 2 links back to 1
    val edges = Seq(3L -> 1L, 4L -> 1L, 5L -> 1L, 1L -> 2L, 2L -> 1L,
      3L -> 4L, 4L -> 5L, 5L -> 3L)
    val got = sparkRank(edges, 5)
    assert(got(1L) > got(3L), "the linked-to hub must outrank the periphery")
    assert(got(2L) > got(3L), "hub authority propagates one hop")
  }

  test("empty and all-null edge frames yield an empty result, not a crash") {
    assert(sparkRank(Seq.empty, 3).isEmpty)
    val nulls = Seq((Some(1L), Option.empty[Long]))
      .toDF("src", "dst")
    assert(PageRank.pageRank(nulls, iterations = 3).count() == 0)
  }

  test("duplicate edges collapse and self loops are ordinary edges") {
    val base = Seq(1L -> 2L, 2L -> 1L)
    assert(sparkRank(base ++ base, 3) == sparkRank(base, 3))
    val loop = Seq(1L -> 1L, 1L -> 2L, 2L -> 1L)
    assert(sparkRank(loop, 3) == localRank(loop, 3))
  }
}
