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
    * separators removed (Spark's split keeps them, DuckDB's doesn't). */
  def words(c: Column): Column =
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
}
