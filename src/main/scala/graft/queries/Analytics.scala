package graft.queries

import graft.{Exact, Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational analytics suite (SURVEY.md §2 B1–B10).
  *
  * Scale notes baked into every query:
  *  - dimension tables (region/nation/supplier/customer at low SF) are
  *    broadcast explicitly so the fact-table scan never shuffles for them;
  *  - aggregations run on decimal-cast inputs (see [[graft.Exact]]) so the
  *    result is order-independent — required both for the DuckDB oracle and
  *    for determinism across cluster re-runs/speculative retries;
  *  - every query ends in a deterministic total order with a unique
  *    tie-break key, so output is stable at any parallelism.
  */
object Analytics {
  import Exact._

  /** B1: grouped aggregation over the fact table (TPC-H Q1 family).
    * One shuffle on the (low-cardinality) group keys; partial aggregation
    * happens map-side, so shuffle volume is O(groups × partitions). */
  val q1Agg: Q = Q(
    "q1_agg",
    (s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some(s"""SELECT l_returnflag, l_linestatus,
      ${sqlDsum("l_quantity")} AS sum_qty,
      ${sqlDsum("l_extendedprice")} AS sum_base_price,
      ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
      ${sqlDsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
      ${sqlDavg("l_quantity")} AS avg_qty,
      ${sqlDavg("l_discount")} AS avg_disc,
      COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  /** B2: shipping-priority join (TPC-H Q3 family): filter each side before
    * the join (pushed into the parquet scan), shuffle only on join keys,
    * then top-k. At 100 TB the orderkey shuffle is unavoidable; AQE
    * coalesces the post-filter partitions. */
  val q3Shipping: Q = Q(
    "q3_shipping",
    (s, d) => {
      val cutoff = lit("1997-06-15 00:00:00").cast("timestamp")
      val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val o = Tables.orders(s, d).filter(col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      val l = Tables.lineitem(s, d).filter(col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .select(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
          col("o_orderpriority").as("orderpriority"), col("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },
    Some(s"""SELECT l_orderkey,
      strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
      o_orderpriority AS orderpriority,
      ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS revenue
      FROM customer JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1997-06-15 00:00:00'
        AND l_shipdate  > TIMESTAMP '1997-06-15 00:00:00'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, l_orderkey LIMIT 10"""))

  /** B3: star join over all dimensions (TPC-H Q5 family). region/nation/
    * supplier/customer are broadcast — at 100 TB the only shuffle left is
    * lineitem→orders on orderkey. */
  val q5RegionRevenue: Q = Q(
    "q5_region_revenue",
    (s, d) => {
      val lo = lit("1996-01-01 00:00:00").cast("timestamp")
      val hi = lit("1998-01-01 00:00:00").cast("timestamp")
      val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
      val n = Tables.nation(s, d)
      val c = Tables.customer(s, d)
      val sup = Tables.supplier(s, d)
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      val l = Tables.lineitem(s, d)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(sup), l("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(c),
          o("o_custkey") === c("c_custkey") &&
            c("c_nationkey") === sup("s_nationkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy(col("n_name"))
    },
    Some(s"""SELECT n_name, ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS revenue
      FROM customer JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY n_name ORDER BY n_name"""))

  /** B4: global top-k — Spark's sort+limit runs as a per-partition top-k
    * followed by a single-reducer merge of k rows, so it scales to any
    * input size. */
  val qTopkOrders: Q = Q(
    "q_topk_orders",
    (s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20),
    Some("""SELECT o_orderkey, o_custkey, o_totalprice,
      strftime(o_orderdate, '%Y-%m-%d') AS orderdate
      FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20"""))

  /** B5: window functions — rank within partition + running sum. The
    * running sum is computed over decimal so it is exact no matter how the
    * engine associates the additions (DuckDB uses segment trees). */
  val qWindowRank: Q = Q(
    "q_window_rank",
    (s, d) => {
      val byBal = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      val byKey = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.customer(s, d)
        .withColumn("bal_rank", row_number().over(byBal))
        .withColumn("running_bal",
          sum(col("c_acctbal").cast("decimal(38,10)")).over(byKey).cast("double"))
        .filter(col("bal_rank") <= 5)
        .select(col("c_mktsegment"), col("bal_rank"), col("c_custkey"),
          col("c_acctbal"), col("running_bal"))
        .orderBy(col("c_mktsegment"), col("bal_rank"))
    },
    Some("""SELECT c_mktsegment, bal_rank, c_custkey, c_acctbal, running_bal FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
        row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS bal_rank,
        CAST(SUM(CAST(c_acctbal AS DECIMAL(38,10))) OVER (
          PARTITION BY c_mktsegment ORDER BY c_custkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_bal
      FROM customer) t
      WHERE bal_rank <= 5 ORDER BY c_mktsegment, bal_rank"""))

  /** B6: exact distinct counts. Spark expands multi-distinct into a
    * two-stage aggregate; at scale prefer one distinct per query or
    * approx_count_distinct (HLL) — both exposed here. */
  val qDistinctParts: Q = Q(
    "q_distinct_parts",
    (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_quantity") > 25)
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          countDistinct(col("l_orderkey")).as("n_orders")),
    Some("""SELECT count(DISTINCT l_partkey) AS n_parts,
      count(DISTINCT l_suppkey) AS n_supps,
      count(DISTINCT l_orderkey) AS n_orders
      FROM lineitem WHERE l_quantity > 25"""))

  /** B7: semi/anti joins — EXISTS and NOT EXISTS as real left-semi /
    * left-anti plans (no row duplication, join stops at first match). */
  val qSemiAnti: Q = Q(
    "q_semi_anti",
    (s, d) => {
      val c = Tables.customer(s, d)
      val urgent = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      val withO = c.join(urgent, c("c_custkey") === urgent("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_customers"))
        .withColumn("tag", lit("with_urgent"))
      val withoutO = c.join(urgent, c("c_custkey") === urgent("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_customers"))
        .withColumn("tag", lit("without_urgent"))
      withO.unionByName(withoutO)
        .select(col("c_mktsegment"), col("tag"), col("n_customers"))
        .orderBy(col("c_mktsegment"), col("tag"))
    },
    Some("""SELECT c_mktsegment, 'with_urgent' AS tag, count(*) AS n_customers
      FROM customer WHERE EXISTS (SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      GROUP BY c_mktsegment
      UNION ALL
      SELECT c_mktsegment, 'without_urgent' AS tag, count(*) AS n_customers
      FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment, tag"""))

  /** B8: ROLLUP grouping sets; rollup NULLs are coalesced to 'ALL' so the
    * oracle compare is null-free. */
  val qRollup: Q = Q(
    "q_rollup",
    (s, d) =>
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("sum_qty"), col("n"))
        .orderBy("returnflag", "linestatus"),
    Some(s"""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
      coalesce(l_linestatus, 'ALL') AS linestatus,
      ${sqlDsum("l_quantity")} AS sum_qty, count(*) AS n
      FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY returnflag, linestatus"""))

  /** B16: full CUBE — all 2^d grouping sets in one pass, completing
    * the OLAP trio beside B8's ROLLUP and B9's pivot. `grouping_id`
    * (the standard bitmask, leftmost column = MSB in both engines)
    * disambiguates a genuine NULL value from a subtotal row — the
    * ambiguity the ROLLUP row's coalesce convention tolerates. Spark
    * expands the cube BEFORE the shuffle (one Expand + one hash agg on
    * the 2^d-tagged keys — map-side combinable, no per-set re-scan). */
  val qCube: Q = Q(
    "q_cube",
    (s, d) =>
      Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"),
          grouping_id().as("gid"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("gid"), col("sum_qty"), col("n"))
        .orderBy("gid", "returnflag", "linestatus"),
    Some(s"""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
      coalesce(l_linestatus, 'ALL') AS linestatus,
      CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
      ${sqlDsum("l_quantity")} AS sum_qty, count(*) AS n
      FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
      ORDER BY gid, returnflag, linestatus"""))

  /** B9: pivot as conditional aggregation — one pass, no shuffle beyond the
    * group-by (Spark's pivot() would need a distinct pass to find values;
    * explicit CASE keeps the plan static and oracle-matchable). */
  val qPivotStatus: Q = Q(
    "q_pivot_status",
    (s, d) =>
      Tables.orders(s, d)
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
        .agg(
          sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_open"),
          sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_filled"),
          sum(when(col("o_orderstatus") === "P", 1L).otherwise(0L)).as("n_pending"),
          dsum(col("o_totalprice")).as("total"))
        .orderBy("month"),
    Some(s"""SELECT strftime(o_orderdate, '%Y-%m') AS month,
      CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
      CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
      CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending,
      ${sqlDsum("o_totalprice")} AS total
      FROM orders GROUP BY month ORDER BY month"""))

  /** B10: date-bucketed time series. */
  val qMonthlyRevenue: Q = Q(
    "q_monthly_revenue",
    (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("month"))
        .agg(
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("month"),
    Some(s"""SELECT strftime(l_shipdate, '%Y-%m') AS month,
      ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS revenue,
      count(*) AS n_items
      FROM lineitem GROUP BY month ORDER BY month"""))

  /** B11: exact order statistics — percentile_disc picks ACTUAL data
    * values (SQL-standard first-value-with-cume_dist ≥ q), so results
    * are raw column doubles and hash-match across engines; the
    * interpolating percentile_cont differs in final ULPs between
    * implementations and is exposed only through spark.sql. */
  val qPercentiles: Q = Q(
    "q_percentiles",
    (s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("graft_customer_pct")
      s.sql("""SELECT c_mktsegment,
        percentile_disc(0.25) WITHIN GROUP (ORDER BY c_acctbal) AS p25,
        percentile_disc(0.5)  WITHIN GROUP (ORDER BY c_acctbal) AS p50,
        percentile_disc(0.95) WITHIN GROUP (ORDER BY c_acctbal) AS p95,
        min(c_acctbal) AS lo, max(c_acctbal) AS hi
        FROM graft_customer_pct
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")
    },
    Some("""SELECT c_mktsegment,
      quantile_disc(c_acctbal, 0.25) AS p25,
      quantile_disc(c_acctbal, 0.5)  AS p50,
      quantile_disc(c_acctbal, 0.95) AS p95,
      min(c_acctbal) AS lo, max(c_acctbal) AS hi
      FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  val all: Seq[Q] = Seq(q1Agg, q3Shipping, q5RegionRevenue, qTopkOrders,
    qWindowRank, qDistinctParts, qSemiAnti, qRollup, qCube, qPivotStatus,
    qMonthlyRevenue, qPercentiles)
}
