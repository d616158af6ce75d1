package graft

import org.apache.spark.sql.functions._

/** B16 `q_cube`: all 2^d grouping sets in one pass, with grouping_id
  * separating subtotal rows from genuine values. */
class CubeSpec extends SparkSpec {

  test("cube emits every grouping set once and subtotals are consistent") {
    val out = graft.queries.Analytics.qCube.run(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))
    val byGid = out.groupBy(_._3)
    // gid 0 = (flag, status) cells; 1 = flag subtotals; 2 = status
    // subtotals; 3 = the grand total — all four sets present
    assert(byGid.keySet == Set(0L, 1L, 2L, 3L), byGid.keySet.toString)
    assert(byGid(3L).size == 1 && byGid(1L).size == 3 && byGid(2L).size == 2)
    // counts reconcile across every set
    val grand = byGid(3L).head._5
    assert(byGid(0L).map(_._5).sum == grand)
    assert(byGid(1L).map(_._5).sum == grand)
    assert(byGid(2L).map(_._5).sum == grand)
    // subtotal rows read ALL in the coalesced columns; cell rows do not
    assert(byGid(3L).head._1 == "ALL" && byGid(3L).head._2 == "ALL")
    assert(byGid(0L).forall(r => r._1 != "ALL" && r._2 != "ALL"))
    // dsum quantities are integral (l_quantity), so the double sums
    // reconcile exactly across sets
    val cellSum = byGid(0L).map(_._4).sum
    assert(cellSum == byGid(3L).head._4,
      s"cell sum $cellSum != grand total ${byGid(3L).head._4}")
  }
}
