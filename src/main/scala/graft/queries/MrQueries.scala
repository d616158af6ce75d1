package graft.queries

import graft.{Exact, Q, Tables}
import graft.mr.MapReduce
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Workloads exercising the generic MR API (SURVEY.md §2 A2) and the
  * reference's KV-store data semantics (A7).
  */
object MrQueries {
  import Exact._

  /** A2: word count executed through the generic `MapReduce` API — the
    * reference's wc.go mrapp ported to the typed contract, running as a
    * Catalyst plan with map-side combine (shuffle carries one (word,count)
    * per partition, not one pair per occurrence). */
  val qMrWordcount: Q = Q(
    "q_mr_wordcount",
    (s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("text")).as[(Long, String)]
      MapReduce
        .mapCombineReduce[(Long, String), String, Long, (String, Long)](
          docs,
          dt => dt._2.toLowerCase.split("[^a-z]+").iterator
            .filter(_.nonEmpty).map(w => (w, 1L)),
          _ + _,
          (word, n) => (word, n))
        .toDF("word", "n")
        .orderBy("word")
    },
    Some("""SELECT w AS word, count(*) AS n
      FROM (SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
            FROM documents) t
      WHERE w <> '' GROUP BY w ORDER BY word"""))

  /** A2b: the reference's SECOND flagship mrapp — indexer.go
    * (/root/reference/src/mrapps/indexer.go:20-39) — through the
    * string-typed `runJob` veneer verbatim: map emits each distinct
    * word once per document with the document name, reduce sorts the
    * names and formats `"<n> doc1,doc2,…"`. Tokens are lowercased
    * letter-runs (the repo-wide portability convention, same deviation
    * as A3/A4); doc names are zero-padded so the reference's LEXICAL
    * value sort is also the numeric order the oracle reproduces.
    *
    * Scale note: `runJob` materializes each key's values as a Seq —
    * faithful to the reference reduce contract, and exactly as
    * stopword-fragile as the reference itself. A4's two-phase capped
    * inverted index is the scale-safe form; this row exists for
    * MR-API parity. */
  val qMrIndexer: Q = Q(
    "q_mr_indexer",
    (s, d) => {
      import s.implicits._
      val files = Tables.documents(s, d)
        // %012d: 12 digits holds any doc_id below 10^12, so the padded
        // form never truncates and lexical order == numeric order for
        // the whole supported id range (DuckDB's lpad TRUNCATES past
        // the target width, so a narrower pad would silently diverge
        // between the engines at doc_id >= 10^8)
        .select(format_string("doc%012d", col("doc_id")), col("text"))
        .as[(String, String)]
      MapReduce
        .runJob(
          files,
          (doc, text) => text.toLowerCase.split("[^a-z]+")
            .filter(_.nonEmpty).distinct.toSeq
            .map(w => graft.mr.KeyValue(w, doc)),
          (_, docs) => s"${docs.size} ${docs.sorted.mkString(",")}")
        .toDF("word", "entry")
        .orderBy("word")
    },
    Some("""WITH dw AS (
        SELECT DISTINCT
          'doc' || lpad(CAST(doc_id AS VARCHAR), 12, '0') AS dn, w
        FROM (SELECT doc_id,
                unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
              FROM documents) t
        WHERE w <> '')
      SELECT w AS word,
        CAST(count(*) AS VARCHAR) || ' ' || string_agg(dn, ',' ORDER BY dn) AS entry
      FROM dw GROUP BY w ORDER BY word"""))

  /** A7: KV-log replay — the kvraft data capability (linearizable keyed
    * state from an op log; /root/reference/src/kvraft) re-expressed as
    * batch last-writer-wins reconstruction: for each key (user), the state
    * is the latest op by (ts, event_id), plus replayed counters. One
    * shuffle on the key; the window and the aggregate share it. */
  /** Public API: last-writer-wins KV state from any op-log frame with
    * (user_id, ts, event_id, event_type, value, props). */
  def kvReplay(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val e = events
      val latest = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      e.withColumn("rn", row_number().over(latest))
        .withColumn("n_ops", count(lit(1)).over(Window.partitionBy(col("user_id"))))
        .withColumn("purchase_total",
          round(sum(when(col("event_type") === "purchase", col("value"))
            .otherwise(lit(0)).cast("decimal(38,10)"))
            .over(Window.partitionBy(col("user_id"))), 2).cast("double"))
        .filter(col("rn") === 1)
        .select(
          col("user_id"),
          col("event_type").as("last_type"),
          col("value").as("last_value"),
          get_json_object(col("props"), "$.k").cast("long").as("last_k"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("last_ts"),
          col("n_ops"), col("purchase_total"))
        .orderBy("user_id")
  }

  val qKvReplay: Q = Q(
    "q_kv_replay",
    (s, d) => kvReplay(Tables.events(s, d)),
    Some("""SELECT user_id, last_type, last_value, last_k, last_ts, n_ops, purchase_total
      FROM (SELECT user_id,
        event_type AS last_type, value AS last_value,
        CASE WHEN props IS NOT NULL AND json_valid(props)
             THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) END AS last_k,
        strftime(ts::TIMESTAMP, '%Y-%m-%d %H:%M:%S.%f') AS last_ts,
        row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn,
        count(*) OVER (PARTITION BY user_id) AS n_ops,
        CAST(ROUND(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END AS DECIMAL(38,10)))
          OVER (PARTITION BY user_id), 2) AS DOUBLE) AS purchase_total
        FROM events) t
      WHERE rn = 1 ORDER BY user_id"""))

  val all: Seq[Q] = Seq(qMrWordcount, qMrIndexer, qKvReplay)
}
