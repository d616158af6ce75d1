package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom TopKPerKey operator: direct API, planner shape, and the
  * optimizer rule that rewrites the window row_number()<=k idiom.
  * SparkSpec's session is built with GraftExtensions, so the rule is
  * live for every suite — the oracle-checked queries passing IS the
  * broad integration test; here we pin the specifics. */
class TopKSpec extends SparkSpec {

  private lazy val cust = Tables.customer(spark, sfDir)

  private def windowTop5 = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    cust.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
  }

  test("direct API matches the window formulation") {
    val got = Graft.topKPerKey(cust,
        keys = Seq(col("c_mktsegment")),
        orderBy = Seq(col("c_acctbal").desc, col("c_custkey")), k = 5)
      .select(col("c_mktsegment"), col("c_custkey"), col("rank"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val want = windowTop5
      .select(col("c_mktsegment"), col("c_custkey"), col("rn").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    assert(got.size == 5 * cust.select("c_mktsegment").distinct().count())
  }

  test("planner shape: partial below the exchange, final above") {
    val plan = Graft.topKPerKey(cust, Seq(col("c_mktsegment")),
      Seq(col("c_acctbal").desc, col("c_custkey")), 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyPartial"), plan.take(600))
    assert(plan.contains("TopKPerKeyFinal"), plan.take(600))
    val partialIdx = plan.indexOf("TopKPerKeyPartial")
    val exchangeIdx = plan.indexOf("Exchange hashpartitioning")
    assert(exchangeIdx >= 0 && exchangeIdx < partialIdx,
      "shuffle must sit between partial and final")
  }

  test("optimizer rule rewrites the window idiom automatically") {
    val optimized = windowTop5.queryExecution.optimizedPlan.toString
    assert(optimized.contains("TopKPerKey"), optimized.take(800))
    // and the rewritten plan still returns the window answer
    val viaRule = windowTop5
      .select(col("c_mktsegment"), col("c_custkey"), col("rn"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    // reference computed WITHOUT the rule: strip via a fresh unextended check
    // (the window semantics are pinned by q_window_rank's DuckDB oracle;
    // here assert shape + determinism)
    assert(viaRule.size == 5 * cust.select("c_mktsegment").distinct().count())
    assert(viaRule.groupBy(_._1).forall(_._2.map(_._3).toSeq.sorted == Seq(1, 2, 3, 4, 5)))
  }

  test("rule does NOT fire for rank() or multi-window plans") {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    val rk = cust.withColumn("rn", rank().over(w)).filter(col("rn") <= 5)
    assert(!rk.queryExecution.optimizedPlan.toString.contains("TopKPerKey"))
  }

  test("near-unique keys: partial flushes at its key budget, results exact") {
    // 2M rows over 1M distinct keys — far past FlushKeys per partition,
    // so the partial's heap map flushes repeatedly (the pre-fix version
    // held every key of the partition on-heap); the sorted final must
    // still merge the flush windows into exact per-key top-1.
    val n = 2000000L
    val df = spark.range(n).select(
      pmod(col("id"), lit(1000000L)).as("k"),
      (col("id") * 2654435761L % 1000003L).as("score"), col("id"))
    val out = Graft.topKPerKey(df, Seq(col("k")),
      Seq(col("score").desc, col("id")), 1)
    assert(out.count() == 1000000L)
    // exact equality vs the window formulation on a deterministic slice
    val w = Window.partitionBy(col("k")).orderBy(col("score").desc, col("id"))
    val want = df.filter(col("k") < 2000)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 1)
      .select("k", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = out.filter(col("k") < 2000)
      .select("k", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
  }

  test("k larger than group size returns whole groups, ranked") {
    import spark.implicits._
    val df = Seq((1L, 10.0), (1L, 20.0), (2L, 5.0)).toDF("k", "v")
    val got = Graft.topKPerKey(df, Seq(col("k")), Seq(col("v").desc), 100)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(got == Set((1L, 20.0, 1L), (1L, 10.0, 2L), (2L, 5.0, 1L)))
  }
}
