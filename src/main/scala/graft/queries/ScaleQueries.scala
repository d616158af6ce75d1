package graft.queries

import graft.{Exact, Q, Tables}
import org.apache.spark.sql.functions._

/** Oracle-checked entries for the scale-path machinery: the custom
  * TopKPerKey operator and the salted skew join must produce EXACTLY
  * what their straightforward formulations produce — DuckDB runs the
  * straightforward SQL, graft runs the scale plan.
  */
object ScaleQueries {
  import Exact._

  /** Top-3 customers per market segment through
    * [[graft.Graft.topKPerKey]] (custom partial/final bounded-heap
    * plan); the oracle is the plain window formulation. */
  val qTopkPerKey: Q = Q(
    "q_topk_per_key",
    (s, d) =>
      graft.Graft.topKPerKey(
          Tables.customer(s, d),
          keys = Seq(col("c_mktsegment")),
          orderBy = Seq(col("c_acctbal").desc, col("c_custkey")),
          k = 3)
        .select(col("c_mktsegment"), col("rank"), col("c_custkey"), col("c_acctbal"))
        .orderBy("c_mktsegment", "rank"),
    Some("""SELECT c_mktsegment, rank, c_custkey, c_acctbal FROM (
        SELECT c_mktsegment, c_custkey, c_acctbal,
          CAST(row_number() OVER (PARTITION BY c_mktsegment
            ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rank
        FROM customer) t
      WHERE rank <= 3 ORDER BY c_mktsegment, rank"""))

  /** Brand revenue via [[graft.ops.ScaleOps.saltedJoin]] (16-way salt on
    * the fact side, dimension replicated); the oracle is the plain
    * join — salting must be invisible in the result. */
  val qSkewJoin: Q = Q(
    "q_skew_join",
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
      val part = Tables.part(s, d)
        .filter(col("p_size") <= 10)
        .select(col("p_partkey").as("l_partkey"), col("p_brand"))
      graft.ops.ScaleOps.saltedJoin(li, part, Seq("l_partkey"), buckets = 16)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_items"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy("p_brand")
    },
    Some(s"""SELECT p_brand, count(*) AS n_items,
      ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_size <= 10
      GROUP BY p_brand ORDER BY p_brand"""))

  /** Each order joined as-of to the same customer's latest STRICTLY
    * EARLIER order via [[graft.ops.AsOfJoin.asOfJoinBig]] (the
    * big-states shuffle variant: union → one hash shuffle on custkey →
    * per-partition sort → running carry-forward; no broadcast). Event
    * time packs (unix_millis, orderkey) into one long — valid while
    * orderkey < 2^20 and |millis| < 2^43; a real deployment brings its
    * own monotone (time, seq) encoding — so "strictly before me" is
    * factTime = t − 1 and the oracle is plain lag() over the same
    * order. Nulls (a customer's first order) surface as −1 so the
    * cross-engine hash stays type-stable. */
  val qAsofPrevOrder: Q = Q(
    "q_asof_prev_order",
    (s, d) => {
      val orders = Tables.orders(s, d)
      val millis = graft.Exact.epochMillisNtz("o_orderdate")
      val t = millis * (1L << 20) + col("o_orderkey")
      val facts = orders.select(col("o_custkey"), col("o_orderkey"),
        (t - 1).as("__ft"))
      val states = orders.select(col("o_custkey"), t.as("__st"),
        col("o_orderkey").as("prev_orderkey"),
        col("o_totalprice").as("prev_totalprice"))
      graft.ops.AsOfJoin.asOfJoinBig(facts, states, Seq("o_custkey"),
          factTime = "__ft", stateTime = "__st",
          payload = Seq("prev_orderkey", "prev_totalprice"))
        .select(col("o_custkey"), col("o_orderkey"),
          coalesce(col("prev_orderkey"), lit(-1L)).as("prev_orderkey"),
          coalesce(col("prev_totalprice"), lit(-1.0)).as("prev_totalprice"))
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey,
        coalesce(lag(o_orderkey) OVER w, -1) AS prev_orderkey,
        coalesce(lag(o_totalprice) OVER w, -1.0) AS prev_totalprice
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      ORDER BY o_custkey, o_orderkey"""))

  val all: Seq[Q] = Seq(qTopkPerKey, qSkewJoin, qAsofPrevOrder)
}
