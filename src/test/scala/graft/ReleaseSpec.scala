package graft

import org.apache.spark.sql.functions._

/** The session-hygiene contract behind the bench's per-query isolation
  * (the r4 lesson: blocks that outlive their query slowed 7 unrelated
  * queries >2x): [[graft.ops.Release.sweep]] must verifiably return the
  * session to zero pinned storage, across every pinning path the
  * library has — PlanCache memos and iterative-operator checkpoints. */
class ReleaseSpec extends SparkSpec {

  test("sweep drains PlanCache memos and reports empty storage") {
    val pc = new graft.ops.PlanCache(capacity = 2)
    val memo = pc.memo(spark.range(1000).toDF("id"))
    memo.count() // materialize the persist
    val (nBefore, memBefore, _) = graft.ops.Release.held(spark)
    assert(nBefore >= 1 && memBefore > 0, "memo should pin storage")
    graft.ops.Release.sweep(spark)
    val (n, mem, disk) = graft.ops.Release.held(spark)
    assert(n == 0 && mem == 0L && disk == 0L,
      s"storage not drained: $n rdds, $mem mem, $disk disk")
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("a memo re-requested after sweep re-persists instead of serving dead blocks") {
    val pc = new graft.ops.PlanCache(capacity = 2)
    val plan = spark.range(500).toDF("id").withColumn("x", col("id") * 2)
    assert(pc.memo(plan).count() == 500L)
    graft.ops.Release.sweep(spark)
    // same canonical plan, post-sweep: must rebuild, not hit freed blocks
    assert(pc.memo(plan).count() == 500L)
    graft.ops.Release.sweep(spark)
  }

  test("sweep releases an iterative operator's result-backing checkpoint") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val pr = graft.ops.PageRank.pageRank(edges, iterations = 2)
    assert(pr.count() == 3L) // consume the result first
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
      "final checkpoint should still be pinned while the frame is live")
    graft.ops.Release.sweep(spark)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }
}
