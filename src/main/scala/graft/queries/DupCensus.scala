package graft.queries

import graft.{Q, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** D19: corpus duplication census — the document-frequency histogram of
  * word k-grams (Lee et al. ACL'22 §5-style analysis: "how much of the
  * corpus is duplicated text, and how heavy is the tail?"). For each
  * distinct k-gram, df = distinct docs containing it and occ = total
  * occurrences; the census groups grams by df:
  *
  *   (df, n_grams, n_occurrences)  — ordered by df
  *
  * This is the policy input BEFORE running a dedup pass: the df=1 row
  * is the unique mass, Σ_{df≥2} n_occurrences − n_grams bounds the
  * positions ExactSubstr excision (D16) would touch, and a heavy tail
  * (large-df rows) is the boilerplate a block/line screen should
  * catch. D14/D16 then act on the individual spans; this row prices
  * the action corpus-wide at histogram cost.
  *
  * Scale shape: one tokenize+shingle pass; grams leave the scan as
  * 16-byte md5 keys (never gram text — the D1 rule: 128-bit keys keep
  * the collision expectation at zero where a narrow hash would
  * birthday-merge distinct grams and corrupt the histogram), one
  * hash agg on (gram, doc) then (gram) — both map-side-combinable —
  * and a final agg on the tiny df domain. Nothing corpus-sized ever
  * sits on one node; output is at most max(df) rows.
  *
  * The DuckDB oracle groups on the gram STRING itself — hash equality
  * with the md5-keyed Spark plan is exactly the no-collision claim.
  */
object DupCensus {

  /** Census k: 3 for the oracle row — the synthetic 31-word vocabulary
    * makes 3-grams collide richly (a real df spectrum), while the D9/D14
    * k=8 grams are nearly all unique at test SF. Production calls pick
    * the k of the dedup pass being priced. */
  val CensusK = 3

  def dupCensus(docs: DataFrame, k: Int = CensusK): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // md5 BYTES (unhex), not the hex string: same 128-bit key, half
    // the shuffle bytes — the key never appears in output
    // widenScan before the tokenize+shingle+md5 map (guide §2.5)
    val grams = graft.ops.ScaleOps.widenScan(docs, "doc_id")
      .select(col("doc_id"),
        explode(shingles(words(col("text")), k)).as("s"))
      .select(col("doc_id"), unhex(md5(col("s"))).as("g"))
    // (gram, doc) partial first: the countDistinct lands on pre-reduced
    // rows, and per-doc occ sums ride along in the same shuffle.
    val perGramDoc = grams.groupBy("g", "doc_id").agg(count(lit(1)).as("occ"))
    val perGram = perGramDoc.groupBy("g")
      .agg(count(lit(1)).as("df"), sum(col("occ")).as("occ"))
    perGram.groupBy("df")
      .agg(count(lit(1)).as("n_grams"), sum(col("occ")).as("n_occurrences"))
      .orderBy("df")
  }

  val qDupCensus: Q = Q(
    "q_dup_census",
    (s, d) => dupCensus(Tables.documents(s, d)),
    Some(s"""WITH w AS (
        SELECT doc_id, list_filter(${sqlWords("text")}, t -> t <> '') AS toks
        FROM documents),
      sh AS (
        SELECT doc_id, unnest(${sqlShingles("toks", CensusK)}) AS s FROM w),
      per AS (
        SELECT s, CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
          CAST(count(*) AS BIGINT) AS occ
        FROM sh GROUP BY s)
      SELECT df, CAST(count(*) AS BIGINT) AS n_grams,
        CAST(sum(occ) AS BIGINT) AS n_occurrences
      FROM per GROUP BY df ORDER BY df"""))

  val all: Seq[Q] = Seq(qDupCensus)
}
