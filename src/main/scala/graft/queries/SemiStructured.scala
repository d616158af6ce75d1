package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semi-structured extraction (SURVEY.md §2 B11): typed field extraction
  * from a JSON string column — the ingestion step between raw JSONL
  * and relational operators. Uses `from_json` with an EXPLICIT schema
  * (schema inference over 100 TB is a full extra pass; a fixed schema
  * is also what keeps the parse inside whole-stage codegen). Malformed
  * or missing fields become nulls and are COUNTED, not dropped — a
  * production ingest reports its parse-failure rate.
  */
object SemiStructured {

  /** Per-event-type stats of the `props.k` JSON field over any frame
    * with (event_type, props): event volume, how many rows carried a
    * parseable `k`, and its sum/min/max. */
  def propStats(events: DataFrame): DataFrame = {
    val k = from_json(col("props"), "k BIGINT", Map.empty[String, String])
      .getField("k")
    events
      .select(col("event_type"), k.as("k"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        count(col("k")).as("n_with_k"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")
  }

  val qJsonProps: Q = Q(
    "q_json_props",
    (s, d) => propStats(Tables.events(s, d)),
    Some("""SELECT event_type,
        count(*) AS n_events,
        count(k) AS n_with_k,
        CAST(sum(k) AS BIGINT) AS sum_k,
        min(k) AS min_k,
        max(k) AS max_k
      FROM (SELECT event_type,
              -- json_type guard mirrors from_json's typed parse: a
              -- string-typed "5" or a double 6.9 is NULL in Spark's
              -- k BIGINT struct, so only integer-typed values count
              CASE WHEN props IS NOT NULL AND json_valid(props)
                    AND json_type(json_extract(props, '$.k')) IN ('BIGINT', 'UBIGINT')
                   THEN CAST(json_extract(props, '$.k') AS BIGINT)
              END AS k
            FROM events) t
      GROUP BY event_type
      ORDER BY event_type"""))

  val all: Seq[Q] = Seq(qJsonProps)
}
