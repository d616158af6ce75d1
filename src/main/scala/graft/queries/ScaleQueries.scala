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

  val all: Seq[Q] = Seq(qTopkPerKey, qSkewJoin)
}
