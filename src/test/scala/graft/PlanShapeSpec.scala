package graft

/** Plan-shape regression guard: the properties PLANS.md documents,
  * pinned as assertions so a lost pushdown, a lost broadcast, or a
  * lost operator rewrite fails the suite instead of silently costing
  * 100× at scale. */
class PlanShapeSpec extends SparkSpec {

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sfDir).queryExecution.executedPlan.toString

  test("q1_agg pushes the date filter into the parquet scan") {
    val p = plan("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p.take(2000))
  }

  test("q5_region_revenue broadcasts every dimension") {
    val p = plan("q5_region_revenue")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).size
    assert(broadcasts >= 4, s"expected >=4 broadcast joins, got $broadcasts")
    assert(!p.contains("SortMergeJoin"), "a dimension join fell back to sort-merge")
  }

  test("top-k window idiom rewrites to the bounded-heap operator across queries") {
    // (q_window_rank keeps its plain window by design: a running-sum
    // window sits between the rank and its filter, so the rewrite
    // precondition — Filter directly over the rank window — fails)
    for (q <- Seq("q_tfidf", "q_stratified_sample"))
      assert(plan(q).contains("TopKPerKey"), s"$q lost the TopKPerKey rewrite")
  }

  test("q_bm25 takes the global top-k without a full sort") {
    assert(plan("q_bm25").contains("TakeOrderedAndProject"))
  }

  test("q_topk_orders is a TakeOrdered, not a global sort") {
    assert(plan("q_topk_orders").contains("TakeOrderedAndProject"))
  }

  test("scrub and token map stages read only the columns they use") {
    val p = plan("q_pii_scrub")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p.take(2000))
  }
}
