package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives shared by the MR-surface and text-analysis
  * operators. All stay inside whole-stage codegen (built-in functions +
  * higher-order array functions — no UDFs).
  *
  * Tokenization matches the reference word-count contract
  * (/root/reference/src/mrapps/wc.go:22-27: words are maximal runs of
  * letters, everything else separates), lowercased for portability.
  */
object TextFunctions {

  /** Lowercased letter-run tokens; empty tokens from leading/trailing
    * separators removed (Spark's split keeps them, DuckDB's doesn't).
    * Native one-pass tokenizer; [[wordsHof]] keeps the split+filter
    * formulation for differential tests. */
  def words(c: Column): Column = NativeExpressions.tokens(c)

  /** Reference HOF formulation of [[words]]. */
  private[graft] def wordsHof(c: Column): Column =
    filter(split(lower(c), "[^a-z]+"), w => w =!= "")

  /** Oracle-side (DuckDB) fragment matching [[words]] of column `col`,
    * exploded to one row per token aliased `w` — use inside a FROM clause:
    * `SELECT unnest(...) AS w`. Empty tokens must still be filtered with
    * `w <> ''` (leading separators). */
  def sqlWords(col: String): String =
    s"string_split_regex(lower($col), '[^a-z]+')"

  /** Normalized form used for fingerprints/dedup: lowercase, every
    * non-alphanumeric run collapsed to one space, trimmed. Result is pure
    * ASCII `[a-z0-9 ]` so byte == codepoint for portable hashing. */
  def normText(c: Column): Column =
    trim(regexp_replace(lower(c), "[^a-z0-9]+", " "))

  /** Oracle-side (DuckDB) fragment matching [[normText]]. */
  def sqlNormText(col: String): String =
    s"trim(regexp_replace(lower($col), '[^a-z0-9]+', ' ', 'g'))"

  /** 64-bit polynomial rolling hash of an ASCII string:
    * acc = (acc*31 + byte) mod 1e9+7. Deterministic and portable — the
    * document-fingerprint primitive (SURVEY.md §3 "shared-hash
    * determinism"). Runs as a native codegen expression
    * ([[NativeExpressions.PolyHash]]); [[polyHashHof]] keeps the
    * reference higher-order-function formulation for differential tests. */
  def polyHash(c: Column): Column = NativeExpressions.polyHash(c)

  /** Reference HOF formulation of [[polyHash]] (chars → ascii → fold) —
    * slower, kept as the semantic spec the native expression must match. */
  private[graft] def polyHashHof(c: Column): Column =
    aggregate(
      transform(filter(split(c, ""), ch => ch =!= ""), ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, x) => (acc * 31 + x) % 1000000007L)

  /** Oracle-side (DuckDB) fragment matching [[polyHash]]. */
  def sqlPolyHash(col: String): String =
    s"""list_reduce(
       list_prepend(0::BIGINT,
         list_transform(string_split($col, ''), ch -> ascii(ch)::BIGINT)),
       (acc, x) -> (acc*31 + x) % 1000000007)"""

  /** Word k-shingles (k consecutive tokens joined by one space) from a
    * token-array column; empty array when there are fewer than k tokens. */
  def shingles(toks: Column, k: Int): Column =
    when(size(toks) >= k,
      transform(sequence(lit(1), size(toks) - (k - 1)),
        i => concat_ws(" ", slice(toks, i, lit(k)))))
      .otherwise(array())

  /** Oracle-side (DuckDB) fragment matching [[shingles]] of a list-typed
    * SQL expression `toks` (range(1, n) is empty for n <= 1, so the <k
    * case needs no guard; slice bounds are inclusive). */
  def sqlShingles(toks: String, k: Int): String =
    s"list_transform(range(1, len($toks) - ${k - 2}), i -> array_to_string(($toks)[i:i+${k - 1}], ' '))"

  /** Count of tokens that appear in a fixed stopword list (native
    * hash-set membership pass). */
  def stopHits(toks: Column, stopwords: Seq[String]): Column =
    NativeExpressions.countIn(toks, stopwords)

  /** Reference HOF formulation of [[stopHits]]. */
  private[graft] def stopHitsHof(toks: Column, stopwords: Seq[String]): Column =
    size(filter(toks, w => w.isin(stopwords: _*))).cast("long")

  /** Oracle-side (DuckDB) fragment matching [[stopHits]]. */
  def sqlStopHits(toks: String, stopwords: Seq[String]): String =
    s"len(list_filter($toks, w -> w IN (${stopwords.map(w => s"'$w'").mkString(",")})))"
}
