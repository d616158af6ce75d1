package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** D22: fuzzy entity matching (record linkage) by FastSS
  * deletion-neighborhood blocking + exact Levenshtein verification —
  * the "dirty feed vs master table" join a curation pipeline runs on
  * vendor/entity names before keying on them.
  *
  * Algorithm (Bocek et al. 2007, FastSS; the SymSpell index): if
  * lev(s, t) <= k then the sets of strings reachable by deleting AT
  * MOST k characters from s and from t intersect — take an edit script
  * with e <= k operations, delete from s every substituted/deleted
  * character and from t every substituted/inserted one; both land on
  * the same subsequence with <= k deletions each. So candidate
  * generation = explode each side's deletion neighborhood, equi-join
  * on the variant string, and verify survivors with one Levenshtein
  * call. PROVABLY LOSSLESS — the oracle row runs the naive all-pairs
  * SQL and hash-equality is the blocking's losslessness proof (the
  * D4b pattern).
  *
  * Scale shape: |s|^k/k! blocking keys per string (≈ 1 + |s| + |s|²/2
  * at k = 2) — generated inline by codegen'd array lambdas, never
  * materialized per row beyond the explode; the candidate join is an
  * equi-join on the variant key (shuffle both sides on that key;
  * short common variants skew → AQE skew split handles the hot
  * buckets), and verification cost is |candidates|, not |dirty|·|master|.
  * This is the quadratic-free shape that survives a 10^8-row master;
  * brute force is the oracle, not the plan.
  */
object FuzzyJoin {

  /** All strings reachable from `e` by deleting exactly one character
    * (SQL expression string — composable for nesting). Guarded for
    * the empty string, where Spark's descending `sequence(1, 0)`
    * would fabricate indices. */
  private def del1(e: String, v: String): String =
    s"""if(length($e) < 1, array(),
        transform(sequence(1, length($e)),
          $v -> concat(substring($e, 1, $v - 1),
                       substring($e, $v + 1, length($e)))))"""

  /** The deletion-neighborhood key array of internal column `gf_n`
    * under `maxDist` (0/1/2). */
  private def keysExpr(maxDist: Int) = {
    require(maxDist >= 0 && maxDist <= 2,
      s"maxDist must be 0, 1 or 2 (got $maxDist)")
    val base = "array(gf_n)"
    val k =
      if (maxDist == 0) base
      else if (maxDist == 1) s"concat($base, ${del1("gf_n", "i")})"
      else s"""concat($base, ${del1("gf_n", "i")},
        flatten(transform(${del1("gf_n", "i")}, t -> ${del1("t", "j")})))"""
    expr(s"array_distinct($k)")
  }

  /** Blocked fuzzy join: distinct `dirty(dirtyCol)` × distinct
    * `master(masterCol)` pairs with lev <= maxDist. Output:
    * (dirty_name, master_name, dist BIGINT), one row per matched pair. */
  def fuzzyJoin(
      dirty: DataFrame, dirtyCol: String,
      master: DataFrame, masterCol: String,
      maxDist: Int = 2): DataFrame = {
    val d = dirty.select(col(dirtyCol).as("gf_n")).filter(col("gf_n").isNotNull)
      .distinct()
      .select(col("gf_n").as("dirty_name"), explode(keysExpr(maxDist)).as("bk"))
    val m = master.select(col(masterCol).as("gf_n")).filter(col("gf_n").isNotNull)
      .distinct()
      .select(col("gf_n").as("master_name"), explode(keysExpr(maxDist)).as("bk"))
    d.join(m, "bk")
      .select(col("dirty_name"), col("master_name"))
      .distinct()
      // compute the O(|s|·|t|) DP once per candidate — Catalyst does
      // not dedupe the expression across Filter and Project
      .withColumn("dist",
        levenshtein(col("dirty_name"), col("master_name")).cast("long"))
      .filter(col("dist") <= maxDist)
      .orderBy("dirty_name", "master_name")
  }

  /** Deterministic one-character corruption of part names — the dirty
    * feed for the oracle row: delete the character at position
    * (ascii(first char) + length) mod length + 1. */
  private val posSql =
    "((ascii(substring(name, 1, 1)) + length(name)) % length(name) + 1)"

  private def dirtyNames(part: DataFrame): DataFrame =
    part.select(col("p_name").as("name")).distinct()
      .select(expr(
        s"concat(substring(name, 1, $posSql - 1), substring(name, $posSql + 1, length(name)))")
        .as("name"))
      .distinct()

  val qFuzzyJoin: Q = Q(
    "q_fuzzy_join",
    (s, d) => fuzzyJoin(
      dirtyNames(Tables.part(s, d)), "name",
      Tables.part(s, d), "p_name",
      maxDist = 2),
    Some(s"""WITH names AS (SELECT DISTINCT p_name AS name FROM part),
      dirty AS (SELECT DISTINCT
          substr(name, 1, ((ascii(substr(name, 1, 1)) + length(name)) % length(name) + 1) - 1) ||
          substr(name, ((ascii(substr(name, 1, 1)) + length(name)) % length(name) + 1) + 1)
          AS dirty_name
        FROM names)
      SELECT d.dirty_name, n.name AS master_name,
        CAST(levenshtein(d.dirty_name, n.name) AS BIGINT) AS dist
      FROM dirty d, names n
      WHERE levenshtein(d.dirty_name, n.name) <= 2
      ORDER BY dirty_name, master_name"""))

  val all: Seq[Q] = Seq(qFuzzyJoin)
}
