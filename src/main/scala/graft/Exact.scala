package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic-arithmetic helpers shared by every oracle-checked query.
  *
  * Why: the driver hash-compares our parquet output against DuckDB's result.
  * Floating-point SUMs are order-dependent, and round() semantics differ
  * subtly between engines, so any double that reaches an aggregate must be
  * made exact first.
  *
  * The trick: cast the double to DECIMAL(38,10) before summing. No IEEE-754
  * double lies exactly on a half-boundary at 10 decimal places (that value
  * would need a factor 5^-11, which is not dyadic), so double->decimal
  * rounding is unambiguous and identical in every engine regardless of its
  * rounding mode. The decimal SUM is then exact/associative, and the final
  * decimal->double cast is correctly rounded in both Spark and DuckDB.
  *
  * Oracle-side equivalent: CAST(SUM(CAST(x AS DECIMAL(38,10))) AS DOUBLE).
  */
object Exact {
  /** Exact, order-independent sum of a double expression, as double.
    *
    * The exact decimal sum is rescaled to 2 fractional digits before the
    * double cast: DuckDB casts decimal->double as int128->double followed
    * by a division by 10^scale (two roundings), which only matches Spark's
    * correctly-rounded BigDecimal cast while |value|*10^scale < 2^53.
    * Scale 2 keeps money-sized sums exact up to ~9e13.
    *
    * The rescale MUST be round(), not a decimal downscale cast: Spark's
    * cast rounds HALF_UP but DuckDB's cast breaks .xx5 ties differently,
    * and money sums land exactly on half-cents all the time. Both engines'
    * round() are half-away-from-zero. */
  def dsum(c: Column): Column =
    round(sum(c.cast("decimal(38,10)")), 2).cast("double")

  /** Exact mean: exact decimal sum rounded at 4 fractional digits (enough
    * for ratio-sized values, still < 2^53 once scaled) divided by count. */
  def davg(c: Column): Column =
    round(sum(c.cast("decimal(38,10)")), 4).cast("double") / count(c)

  /** SQL fragment for the oracle side of [[dsum]]. */
  def sqlDsum(expr: String): String =
    s"CAST(ROUND(SUM(CAST(($expr) AS DECIMAL(38,10))), 2) AS DOUBLE)"

  /** SQL fragment for the oracle side of [[davg]]. */
  def sqlDavg(expr: String): String =
    s"CAST(ROUND(SUM(CAST(($expr) AS DECIMAL(38,10))), 4) AS DOUBLE) / COUNT($expr)"

  /** Timezone-free epoch milliseconds of a TIMESTAMP_NTZ column, by
    * name (`unix_millis` rejects NTZ, and casting through TIMESTAMP
    * would drag the session timezone into the value). Backticked so
    * reserved words / spaced names stay plain column references.
    * DuckDB oracle twin: `epoch_ms(c::TIMESTAMP)`. */
  def epochMillisNtz(colName: String): Column =
    org.apache.spark.sql.functions.expr(
      s"timestampdiff(MILLISECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', `$colName`)")
}
