package graft.queries

import graft.{Q, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diffing (SURVEY.md §2 H7) — the incremental-crawl
  * primitive: given two snapshots of a corpus (last month's crawl and
  * this month's), classify every document as added / removed / changed
  * / same, so downstream stages (dedup, embedding, training-mix
  * bookkeeping) reprocess only the delta instead of 100 TB from
  * scratch.
  *
  * Content comparison is by fingerprint — md5 plus the portable poly
  * hash, the same pair as exact dedup (D1): 128+30 bits makes a
  * collision-induced false "same" physically implausible, and the
  * full-outer join then shuffles ~40-byte keyed rows, never text.
  */
object SnapshotDiff {

  /** Diff two (doc_id, text) snapshots: (doc_id, status) for every doc
    * in either, status ∈ added | removed | changed | same (relative to
    * `oldDocs` → `newDocs`). */
  def snapshotDiff(oldDocs: DataFrame, newDocs: DataFrame): DataFrame = {
    def fp(df: DataFrame) = df.select(
      col("doc_id"), md5(col("text")).as("m"), polyHash(col("text")).as("h"))
    val a = fp(oldDocs).as("a")
    val b = fp(newDocs).as("b")
    a.join(b, col("a.doc_id") === col("b.doc_id"), "full_outer")
      .select(
        coalesce(col("a.doc_id"), col("b.doc_id")).as("doc_id"),
        when(col("a.doc_id").isNull, "added")
          .when(col("b.doc_id").isNull, "removed")
          .when(col("a.m") === col("b.m") && col("a.h") === col("b.h"), "same")
          .otherwise("changed").as("status"))
      .orderBy("doc_id")
  }

  /** Driver row: snapshot A drops every 7th doc, snapshot B drops every
    * 5th and rewrites every 11th — deterministic, so the oracle
    * reproduces both snapshots and the full status taxonomy appears. */
  val qSnapshotDiff: Q = Q(
    "q_snapshot_diff",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val oldSnap = docs.filter(col("doc_id") % 7 =!= 0)
      val newSnap = docs.filter(col("doc_id") % 5 =!= 0)
        .withColumn("text",
          when(col("doc_id") % 11 === 0, concat(col("text"), lit(" updated")))
            .otherwise(col("text")))
      snapshotDiff(oldSnap, newSnap)
    },
    Some(s"""WITH a AS (
        SELECT doc_id, md5(text) AS m, ${sqlPolyHash("text")} AS h
        FROM documents WHERE doc_id % 7 <> 0),
      b0 AS (
        SELECT doc_id,
          CASE WHEN doc_id % 11 = 0 THEN text || ' updated' ELSE text END AS text
        FROM documents WHERE doc_id % 5 <> 0),
      b AS (SELECT doc_id, md5(text) AS m, ${sqlPolyHash("text")} AS h FROM b0)
      SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
        CASE WHEN a.doc_id IS NULL THEN 'added'
             WHEN b.doc_id IS NULL THEN 'removed'
             WHEN a.m = b.m AND a.h = b.h THEN 'same'
             ELSE 'changed' END AS status
      FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
      ORDER BY doc_id"""))

  val all: Seq[Q] = Seq(qSnapshotDiff)
}
