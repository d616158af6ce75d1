package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** I7: referential-integrity audit — the input-trust check a pipeline
  * runs BEFORE joining a freshly landed star schema: per foreign key,
  * how many child rows/keys dangle (orphans — a join would silently
  * drop them) and how many parent keys are unreferenced (a broadcast
  * candidate smaller than its row count suggests).
  *
  * Scale shape: per constraint, one child-side key aggregation
  * (shuffle on the FK — the same partitioning the production join
  * would use) and two anti joins against the DISTINCT parent keys
  * (broadcast when the dim fits, shuffle otherwise; AQE decides).
  * Output is one row per constraint — driver-safe forever.
  */
object Integrity {

  /** One foreign-key audit row:
    * (fk, n_child_rows, n_child_keys, n_orphan_rows, n_orphan_keys,
    * n_parent_keys, n_unref_parent_keys). Null child keys (SQL FK
    * semantics: null never dangles) are excluded from key/orphan counts
    * but included in n_child_rows.
    *
    * Single pass per side: child collapses to one (key, cnt) hash agg
    * (null keys form their own group, so row totals need no second
    * scan), parent to its distinct keys; ONE full-outer join on the key
    * aligns the two, and every audit number is a conditional count in
    * ONE final aggregation — the child and parent tables are each
    * scanned exactly once however many numbers the row reports. */
  def fkAudit(
      child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String,
      label: String): DataFrame = {
    val childAgg = child.select(col(childKey).as("k"))
      .groupBy("k").agg(count(lit(1)).as("cnt"))
    val pk = parent.select(col(parentKey).as("k")).filter(col("k").isNotNull)
      .distinct().withColumn("in_parent", lit(1))
    childAgg.join(pk, Seq("k"), "full_outer")
      .agg(
        coalesce(sum(col("cnt")), lit(0L)).as("n_child_rows"),
        count(when(col("k").isNotNull && col("cnt").isNotNull, 1)).as("n_child_keys"),
        coalesce(sum(when(col("k").isNotNull && col("in_parent").isNull,
          col("cnt"))), lit(0L)).as("n_orphan_rows"),
        count(when(col("k").isNotNull && col("cnt").isNotNull &&
          col("in_parent").isNull, 1)).as("n_orphan_keys"),
        count(when(col("in_parent").isNotNull, 1)).as("n_parent_keys"),
        count(when(col("in_parent").isNotNull && col("cnt").isNull, 1))
          .as("n_unref_parent_keys"))
      .select(lit(label).as("fk"), col("n_child_rows"), col("n_child_keys"),
        col("n_orphan_rows"), col("n_orphan_keys"),
        col("n_parent_keys"), col("n_unref_parent_keys"))
  }

  /** The star schema's four FK constraints in one audit frame. */
  def refIntegrity(
      lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
      part: DataFrame, supplier: DataFrame): DataFrame =
    Seq(
      fkAudit(lineitem, "l_orderkey", orders, "o_orderkey",
        "lineitem.l_orderkey->orders.o_orderkey"),
      fkAudit(lineitem, "l_partkey", part, "p_partkey",
        "lineitem.l_partkey->part.p_partkey"),
      fkAudit(lineitem, "l_suppkey", supplier, "s_suppkey",
        "lineitem.l_suppkey->supplier.s_suppkey"),
      fkAudit(orders, "o_custkey", customer, "c_custkey",
        "orders.o_custkey->customer.c_custkey"))
      .reduce(_.union(_))
      .orderBy("fk")

  private def sqlFk(
      child: String, ck: String, parent: String, pk: String): String =
    s"""SELECT '$child.$ck->$parent.$pk' AS fk,
      (SELECT count(*) FROM $child) AS n_child_rows,
      (SELECT count(DISTINCT $ck) FROM $child) AS n_child_keys,
      (SELECT count(*) FROM $child WHERE $ck IS NOT NULL
        AND $ck NOT IN (SELECT $pk FROM $parent WHERE $pk IS NOT NULL)) AS n_orphan_rows,
      (SELECT count(DISTINCT $ck) FROM $child WHERE $ck IS NOT NULL
        AND $ck NOT IN (SELECT $pk FROM $parent WHERE $pk IS NOT NULL)) AS n_orphan_keys,
      (SELECT count(DISTINCT $pk) FROM $parent WHERE $pk IS NOT NULL) AS n_parent_keys,
      (SELECT count(DISTINCT $pk) FROM $parent WHERE $pk IS NOT NULL
        AND $pk NOT IN (SELECT $ck FROM $child WHERE $ck IS NOT NULL)) AS n_unref_parent_keys"""

  val qRefIntegrity: Q = Q(
    "q_ref_integrity",
    (s, d) => refIntegrity(Tables.lineitem(s, d), Tables.orders(s, d),
      Tables.customer(s, d), Tables.part(s, d), Tables.supplier(s, d)),
    Some(Seq(
      sqlFk("lineitem", "l_orderkey", "orders", "o_orderkey"),
      sqlFk("lineitem", "l_partkey", "part", "p_partkey"),
      sqlFk("lineitem", "l_suppkey", "supplier", "s_suppkey"),
      sqlFk("orders", "o_custkey", "customer", "c_custkey"))
      .mkString("\n      UNION ALL\n      ") + "\n      ORDER BY fk"))

  val all: Seq[Q] = Seq(qRefIntegrity)
}
