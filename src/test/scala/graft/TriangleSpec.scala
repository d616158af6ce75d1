package graft

import graft.queries.GraphRank

/** D23 [[GraphRank.triangles]]: planted cliques, triangle-free graphs,
  * hub orientation, and duplicate-row collapsing. */
class TriangleSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long)]) =
    GraphRank.triangles(rows.toDF("l_orderkey", "l_partkey"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("a 4-clique order yields C(4,3)=4 triangles, 3 per node") {
    // one order containing 4 parts = K4; duplicate lineitem rows must
    // collapse (same part twice in the order)
    val out = run(Seq((1L, 10L), (1L, 11L), (1L, 12L), (1L, 13L), (1L, 10L)))
    assert(out.keySet == Set(10L, 11L, 12L, 13L))
    assert(out.values.forall(_ == ((3L, 3L))), s"K4: $out")
  }

  test("paths and stars are triangle-free; one closing edge = one triangle") {
    // star: hub 1 with leaves 2..5 via 2-part orders -> no triangles
    val star = Seq((1L, 1L, 2L), (2L, 1L, 3L), (3L, 1L, 4L), (4L, 1L, 5L))
      .flatMap { case (o, a, b) => Seq((o, a), (o, b)) }
    val s = run(star.map { case (o, p) => (o.toLong, p.toLong) })
    assert(s(1L) == ((4L, 0L)) && s(2L) == ((1L, 0L)), s"star: $s")
    // close one wedge: edge (2,3) -> exactly the triangle {1,2,3}; the
    // high-degree hub is the oriented SINK so its adjacency never fans out
    val closed = star ++ Seq((9L, 2L), (9L, 3L))
    val c = run(closed.map { case (o, p) => (o.toLong, p.toLong) })
    assert(c(1L) == ((4L, 1L)) && c(2L) == ((2L, 1L)) && c(3L) == ((2L, 1L)),
      s"closed star: $c")
    assert(c(4L)._2 == 0L && c(5L)._2 == 0L)
  }

  test("two orders sharing parts do not duplicate the shared edge") {
    // orders {10,11,12} and {10,11,13}: edge (10,11) appears in both
    // orders but is ONE undirected edge; triangles {10,11,12}, {10,11,13}
    val out = run(Seq((1L, 10L), (1L, 11L), (1L, 12L),
      (2L, 10L), (2L, 11L), (2L, 13L)))
    assert(out(10L) == ((3L, 2L)) && out(11L) == ((3L, 2L)), out)
    assert(out(12L) == ((2L, 1L)) && out(13L) == ((2L, 1L)))
  }
}
