package graft

import graft.queries.LinAlg

/** E12/E13 [[LinAlg]]: hand-checked Gram cells on exact fixed-point
  * inputs, symmetry, the power iteration against a known eigensystem,
  * and the projection's consistency with a local dot product. */
class LinAlgSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Array(1.0f, 0.0f)),
    (2L, Array(1.0f, 1.0f))).toDF("vec_id", "embedding")

  test("gramMatrix matches the hand computation and is symmetric") {
    val g = LinAlg.gramMatrix(vecs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(4)))
      .toMap
    // q(1.0) = 4096 exactly; G = [[2, 1], [1, 1]] in original units
    assert(g((0L, 0L)) == ((2L, 2.0)) && g((1L, 1L)) == ((2L, 1.0)))
    assert(g((0L, 1L)) == ((2L, 1.0)) && g((1L, 0L)) == ((2L, 1.0)))
  }

  test("power iteration converges to the dominant eigenvector") {
    // [[2,1],[1,1]]: dominant eigenvalue (3+sqrt5)/2, eigenvector
    // (1, (sqrt5-1)/2) normalized = (0.85065, 0.52573)
    val v = LinAlg.powerIterate(Array(Array(2.0, 1.0), Array(1.0, 1.0)))
    assert(math.abs(v(0) - 0.8506508083520399) < 1e-12 &&
      math.abs(v(1) - 0.5257311121191336) < 1e-12, v.toSeq)
  }

  test("pcaProject equals the local dot product with the fitted vector") {
    val out = LinAlg.pcaProject(vecs).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // fit on the exact Gram above; recompute the expectation locally
    val v = LinAlg.powerIterate(Array(Array(2.0, 1.0), Array(1.0, 1.0)))
    assert(out(1L) == v(0) * 1.0 && out(2L) == v(0) * 1.0 + v(1) * 1.0,
      s"$out vs ${v.toSeq}")
    // the (1,1) vector lies closer to the dominant direction
    assert(math.abs(out(2L)) > math.abs(out(1L)))
  }
}
