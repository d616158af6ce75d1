package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing (SURVEY.md §2 C7): detect and redact emails / IPv4
  * addresses / phone numbers from document text — the pre-training
  * compliance pass every LLM data pipeline runs before anything else.
  * Pure map stage: no shuffle, stays inside whole-stage codegen
  * (regexp_count / regexp_replace are codegen'd built-ins).
  *
  * Patterns are deliberately RE2-compatible (character classes and
  * bounded repeats, no backreferences or lookaround) so the DuckDB
  * oracle runs the IDENTICAL regex and the driver hash-checks the full
  * detect→redact pipeline.
  *
  * The synthetic corpus contains no PII, so the oracle-checked query
  * validates the scrubber by CANARY INJECTION — the standard way to
  * test a scrubber in production: plant deterministic doc_id-derived
  * canaries mid-text, scrub, and require the planted set to be found
  * and redacted exactly.
  */
object Scrub {

  val EmailRe: String = """[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"""
  val Ipv4Re: String = """\b\d{1,3}(\.\d{1,3}){3}\b"""
  val PhoneRe: String = """\+\d{1,3}-\d{3}-\d{4,10}"""

  /** Redact PII in `textCol`, REPLACING it with the clean text and
    * appending detection counts — chain ahead of dedup/quality stages.
    * Redaction order (email → ipv4 → phone) is part of the contract:
    * the placeholder tokens contain no digits or `@`, so later passes
    * never re-match earlier redactions. */
  def scrubPii(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs
      .withColumn("n_emails", regexp_count(t, lit(EmailRe)).cast("long"))
      .withColumn("n_ipv4", regexp_count(t, lit(Ipv4Re)).cast("long"))
      .withColumn("n_phones", regexp_count(t, lit(PhoneRe)).cast("long"))
      .withColumn(textCol,
        regexp_replace(
          regexp_replace(
            regexp_replace(t, EmailRe, "<EMAIL>"),
            Ipv4Re, "<IP>"),
          PhoneRe, "<PHONE>"))
  }

  /** Deterministic canaries: email when doc_id ≡ 0 (mod 3), IPv4 when
    * ≡ 0 (mod 5), phone when ≡ 0 (mod 7) — planted at the midpoint of
    * the text so the scrubber has to find them at a word boundary it
    * did not create. */
  private def withCanaries(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    val email = when(id % 3 === 0,
      concat(lit("user"), id.cast("string"), lit("@example.com")))
    val ipv4 = when(id % 5 === 0,
      concat(lit("10."), (id % 200).cast("string"), lit("."),
        ((id * 7) % 200).cast("string"), lit("."), (id % 250).cast("string")))
    val phone = when(id % 7 === 0,
      concat(lit("+1-555-"), lpad((id % 10000).cast("string"), 4, "0")))
    val canaries = concat_ws(" ", email, ipv4, phone)
    val h = floor(length(col("text")) / 2).cast("int")
    docs.withColumn("text",
      concat(col("text").substr(lit(1), h), lit(" "), canaries, lit(" "),
        col("text").substr(h + 1, length(col("text")))))
  }

  private val sqlCanaried =
    s"""canaried AS (
      SELECT doc_id,
        substr(text, 1, length(text) // 2) || ' ' ||
        concat_ws(' ',
          CASE WHEN doc_id % 3 = 0
               THEN 'user' || CAST(doc_id AS VARCHAR) || '@example.com' END,
          CASE WHEN doc_id % 5 = 0
               THEN '10.' || CAST(doc_id % 200 AS VARCHAR) || '.' ||
                    CAST((doc_id * 7) % 200 AS VARCHAR) || '.' ||
                    CAST(doc_id % 250 AS VARCHAR) END,
          CASE WHEN doc_id % 7 = 0
               THEN '+1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') END)
        || ' ' || substr(text, length(text) // 2 + 1) AS text
      FROM documents)"""

  val qPiiScrub: Q = Q(
    "q_pii_scrub",
    (s, d) => scrubPii(withCanaries(
        Tables.documents(s, d).select(col("doc_id"), col("text"))))
      .select(col("doc_id"), col("n_emails"), col("n_ipv4"), col("n_phones"),
        length(col("text")).cast("long").as("clean_len"),
        md5(col("text")).as("clean_md5"))
      .orderBy("doc_id"),
    Some(s"""WITH $sqlCanaried
      SELECT doc_id,
        CAST(len(regexp_extract_all(text, '$EmailRe')) AS BIGINT) AS n_emails,
        CAST(len(regexp_extract_all(text, '$Ipv4Re')) AS BIGINT) AS n_ipv4,
        CAST(len(regexp_extract_all(text, '$PhoneRe')) AS BIGINT) AS n_phones,
        CAST(length(regexp_replace(regexp_replace(regexp_replace(text,
          '$EmailRe', '<EMAIL>', 'g'), '$Ipv4Re', '<IP>', 'g'),
          '$PhoneRe', '<PHONE>', 'g')) AS BIGINT) AS clean_len,
        md5(regexp_replace(regexp_replace(regexp_replace(text,
          '$EmailRe', '<EMAIL>', 'g'), '$Ipv4Re', '<IP>', 'g'),
          '$PhoneRe', '<PHONE>', 'g')) AS clean_md5
      FROM canaried
      ORDER BY doc_id"""))

  val all: Seq[Q] = Seq(qPiiScrub)
}
