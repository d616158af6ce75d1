package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector primitives over `array<float>` embedding columns, as
  * higher-order-function plans (no UDFs — everything stays a Catalyst
  * expression tree).
  *
  * Determinism contract (shared with the DuckDB oracle): every float is
  * widened to double BEFORE any arithmetic, and every reduction is a
  * strict left fold in element order — so both engines execute the exact
  * same IEEE-754 op sequence and produce bit-identical doubles.
  */
object VectorFunctions {

  /** Left-fold sum of a double-array column. */
  private def foldSum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  /** Dot product of two float/double-array columns, in double — native
    * codegen loop ([[NativeExpressions.DotProduct]]); [[dotHof]] keeps the
    * reference HOF formulation for differential tests. */
  def dot(a: Column, b: Column): Column = NativeExpressions.dot(a, b)

  /** Reference HOF formulation of [[dot]]. */
  private[graft] def dotHof(a: Column, b: Column): Column =
    foldSum(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))

  /** Squared L2 norm of a float-array column, in double (dot(a, a) —
    * identical op sequence to the HOF transform-square fold). */
  def norm2(a: Column): Column = NativeExpressions.dot(a, a)

  /** Cosine similarity: dot / (sqrt(|a|²) * sqrt(|b|²)). Callers should
    * pre-compute norms once per vector when pairing many vectors. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** Cosine from a precomputed dot and squared norms. */
  def cosineFrom(dotCol: Column, n2a: Column, n2b: Column): Column =
    dotCol / (sqrt(n2a) * sqrt(n2b))

  /** Oracle-side (DuckDB) fragment matching [[dot]]: strict left fold over
    * per-element double products. */
  def sqlDot(a: String, b: String): String =
    s"""list_reduce(list_prepend(0.0::DOUBLE,
       list_transform(range(1, len($a)+1), i -> ($a)[i]::DOUBLE * ($b)[i]::DOUBLE)),
       (acc, x) -> acc + x)"""

  /** Oracle-side (DuckDB) fragment matching [[norm2]]. */
  def sqlNorm2(a: String): String =
    s"""list_reduce(list_prepend(0.0::DOUBLE,
       list_transform(range(1, len($a)+1), i -> ($a)[i]::DOUBLE * ($a)[i]::DOUBLE)),
       (acc, x) -> acc + x)"""
}
