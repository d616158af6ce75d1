package graft.queries

import graft.Q
import graft.Tables
import graft.functions.TextFunctions.{polyHash, sqlPolyHash}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** H12 — deterministic train/val/test corpus splitting with a
  * near-duplicate LEAKAGE AUDIT.
  *
  * Splitting training data by hashing the DOCUMENT id is the classic
  * eval-contamination bug: near-duplicate pages (mirrors, re-crawls,
  * syndicated articles) land on both sides of the boundary and the
  * held-out loss silently measures memorization. Practice splits by
  * GROUP — here the `source` column (site/domain/dump) — so
  * within-group near-dups can never straddle a split. What that rule
  * cannot prevent is CROSS-group near-duplication, which is exactly
  * what the audit reports: D2 MinHash near-dup pairs whose members
  * carry different split labels. A clean corpus ships with an empty
  * (or consciously accepted) leakage report next to its split
  * manifest.
  *
  * [[splitAssign]]: `polyHash(source) mod 100` buckets — the portable
  * deterministic hash every engine reproduces (SURVEY §3), so the
  * split is stable run-to-run, machine-to-machine, and engine-to-
  * engine (no RNG state, no sampling API). `bucket < trainPct` →
  * train, `< trainPct + valPct` → val, else test. A map-only plan:
  * no shuffle, no action on text.
  *
  * [[splitLeakage]]: the D2 pair machinery verbatim ([[Dedup
  * .minhashPairs]] — banded LSH candidates, exact signature-agreement
  * rescore, est ≥ 0.5) joined to the assignment on each side, kept
  * where labels differ. Output (id_a, split_a, id_b, split_b,
  * est_jaccard), ordered. Scale shape: assignment is a narrow
  * (doc_id, split) frame; the pair set is small by construction
  * (near-dup density, not corpus size), so AQE broadcasts it and the
  * assignment never re-shuffles. The oracle chains [[Dedup
  * .sqlMinhashPairCtes]] — the same fragment as the standalone D2 row
  * — into the assignment CASE, so audit and dedup cannot drift.
  *
  * Oracle-row params (trainPct=40, valPct=56): the synthetic corpus's
  * 20 source names bucket into three clusters (0–4, 36–45, 95–99),
  * and these thresholds cut them into genuinely populated
  * train/val/test with 20+ cross-split near-dup pairs at sf0.01 —
  * corpus action, not a vacuous empty report. API default stays the
  * conventional 90/5/5.
  */
object Splits {

  private def assigned(docs: DataFrame, trainPct: Int, valPct: Int): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split percentages: train=$trainPct val=$valPct")
    docs
      .select(col("doc_id"), col("source"),
        (polyHash(coalesce(col("source"), lit(""))) % 100).as("bucket"))
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test"))
  }

  /** Deterministic per-SOURCE split assignment; see object doc. */
  def splitAssign(docs: DataFrame, trainPct: Int = 90, valPct: Int = 5): DataFrame =
    assigned(docs, trainPct, valPct).orderBy("doc_id")

  /** Near-dup pairs that CROSS the split boundary; see object doc. */
  def splitLeakage(docs: DataFrame, trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    val asg = assigned(docs, trainPct, valPct).select(col("doc_id"), col("split"))
    Dedup.minhashPairs(docs)
      .join(asg.toDF("doc_id", "split_a"), col("id_a") === col("doc_id"))
      .drop("doc_id")
      .join(asg.toDF("doc_id", "split_b"), col("id_b") === col("doc_id"))
      .drop("doc_id")
      .filter(col("split_a") =!= col("split_b"))
      .select(col("id_a"), col("split_a"), col("id_b"), col("split_b"),
        col("est_jaccard"))
      .orderBy("id_a", "id_b")
  }

  /** Oracle-row thresholds — see object doc. */
  private val OTrain = 40
  private val OVal = 56

  private def sqlLabelCtes: String =
    s"""asg AS (SELECT doc_id, ${sqlPolyHash("coalesce(source, '')")} % 100 AS bucket
        FROM documents),
      lab AS (SELECT doc_id, bucket,
          CASE WHEN bucket < $OTrain THEN 'train'
               WHEN bucket < ${OTrain + OVal} THEN 'val'
               ELSE 'test' END AS split
        FROM asg)"""

  val qSplitAssign: Q = Q(
    "q_split_assign",
    (s, d) => splitAssign(Tables.documents(s, d), OTrain, OVal),
    Some(s"""WITH $sqlLabelCtes
      SELECT d.doc_id, d.source, l.bucket, l.split
      FROM documents d JOIN lab l ON d.doc_id = l.doc_id
      ORDER BY d.doc_id"""))

  val qSplitLeakage: Q = Q(
    "q_split_leakage",
    (s, d) => splitLeakage(Tables.documents(s, d), OTrain, OVal),
    Some(s"""WITH ${Dedup.sqlMinhashPairCtes("documents")},
      $sqlLabelCtes
      SELECT p.id_a, a.split AS split_a, p.id_b, b.split AS split_b,
        p.est_jaccard
      FROM mh_pairs p
      JOIN lab a ON p.id_a = a.doc_id
      JOIN lab b ON p.id_b = b.doc_id
      WHERE a.split <> b.split
      ORDER BY p.id_a, p.id_b"""))

  val all: Seq[Q] = Seq(qSplitAssign, qSplitLeakage)
}
