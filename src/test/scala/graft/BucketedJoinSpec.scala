package graft

import org.apache.spark.sql.functions._

/** Co-located joins via bucketing: writing both sides bucketed on the
  * join key means the join (and aggregations on that key) plan with NO
  * shuffle exchange — the ingest-time shuffle is paid once instead of
  * per query. This is the cluster partitioning strategy SURVEY.md §3
  * prescribes for repeated fact-fact joins at 100 TB.
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed-by-key tables join without a shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    val orders = Tables.orders(spark, sfDir)
    val customer = Tables.customer(spark, sfDir)
    val broadcastThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      sources.Sinks.bucketedTable(orders, "b_orders", s"$wh/o", 4, Seq("o_custkey"))
      sources.Sinks.bucketedTable(customer, "b_cust", s"$wh/c", 4, Seq("c_custkey"))
      // forbid broadcast so the join MUST co-locate by partitioning
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders")
        .join(spark.table("b_cust"), col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n${plan.take(1500)}")
      // and it is still the correct join
      val want = orders.join(customer, col("o_custkey") === col("c_custkey")).count()
      assert(joined.count() == want)
      // aggregation on the bucket key is exchange-free too
      val agg = spark.table("b_orders").groupBy("o_custkey").count()
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_cust")
    }
  }
}
