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
    // q_stream_dedup_batch is the k=1 (first-seen) form of the idiom
    for (q <- Seq("q_tfidf", "q_stratified_sample", "q_stream_dedup_batch"))
      assert(plan(q).contains("TopKPerKey"), s"$q lost the TopKPerKey rewrite")
  }

  test("ranking memo-persists the tf matrix: every branch reads the cache, no rescan") {
    graft.ops.Release.sweep(spark) // drop any memo a prior test created
    // node-typed counts, not string counts: the InMemoryRelation DUMP
    // embeds its own build-plan FileScan, which a regex would miscount
    val sp = SparkEntry.queries("q_tfidf")(spark, sfDir).queryExecution.sparkPlan
    val fileScans = sp.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s }.size
    val memScans = sp.collect {
      case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => s }.size
    assert(fileScans == 0 && memScans >= 2,
      s"tf and df branches must both read the persisted tf matrix " +
        s"(got $fileScans file scans, $memScans cache scans):\n${sp.toString.take(2000)}")
    graft.ops.Release.sweep(spark)
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

  test("q_quality_model is a shuffle-free map stage plus only the output sort") {
    val p = plan("q_quality_model")
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges == 1, s"expected only the orderBy range exchange, got $exchanges:\n${p.take(2000)}")
    assert(!p.contains("Join"), "a join crept into a pure map stage")
  }

  test("q_frame_sample never joins or aggregates — pure generate over the scan") {
    val p = plan("q_frame_sample")
    assert(!p.contains("Join") && !p.contains("HashAggregate"), p.take(2000))
    assert(p.contains("Generate explode"), "frame decimation should be a generator")
  }

  test("q_dedup_blocks carries exactly its two wide shuffles plus the output sort") {
    val p = plan("q_dedup_blocks")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx == 2, s"window + reassembly = 2 hash exchanges, got $hashEx")
  }

  test("q_profile computes every metric in one aggregation over one scan") {
    val p = plan("q_profile")
    val scans = "FileScan parquet".r.findAllIn(p).size
    assert(scans == 1, s"profile must not rescan per metric, got $scans scans")
  }

  test("q_embed_quantize broadcasts the 64-row stats, never shuffles the corpus") {
    val p = plan("q_embed_quantize")
    assert(p.contains("BroadcastHashJoin"), "per-dimension stats should broadcast")
    assert(!p.contains("SortMergeJoin"), "stats join fell back to sort-merge")
  }

  test("q_quality_deciles: bounded histogram thresholds, one corpus scan, no percentile state") {
    graft.ops.Release.sweep(spark)
    val qe = SparkEntry.queries("q_quality_deciles")(spark, sfDir).queryExecution
    val p = qe.executedPlan.toString
    // the round-6 killer: percentile_disc partials buffer an
    // O(corpus-distinct-values) map into one final task
    assert(!p.contains("percentile_disc") && !p.contains("ObjectHashAggregate"),
      s"thresholds must come from the bounded count histogram:\n${p.take(2000)}")
    val sp = qe.sparkPlan
    val fileScans = sp.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s }.size
    val memScans = sp.collect {
      case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => s }.size
    assert(fileScans == 0 && memScans >= 2,
      s"histogram and paint branches must both read the scored memo " +
        s"(got $fileScans file scans, $memScans cache scans):\n${sp.toString.take(2000)}")
    graft.ops.Release.sweep(spark)
  }

  test("q_dsir_weights paints the top-k flag with a broadcast join") {
    graft.ops.Release.sweep(spark)
    val p = plan("q_dsir_weights")
    // model join + topk paint join, both broadcast; neither may fall
    // back to a corpus-wide shuffle join
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).size
    assert(broadcasts >= 2 && !p.contains("SortMergeJoin"),
      s"model and topk paint joins must both broadcast (got $broadcasts):\n${p.take(2000)}")
    graft.ops.Release.sweep(spark)
  }

  test("q_attribution keeps the interval as a residual on one keyed join") {
    val p = plan("q_attribution")
    val joins = "Join".r.findAllIn(p).size
    assert(joins <= 2, s"one purchase-click join expected, got $joins join nodes")
  }
}
