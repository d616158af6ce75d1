package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One operator from SURVEY.md §2: a Spark implementation plus (when the
  * semantics are SQL-expressible) the equivalent DuckDB oracle SQL used by
  * the driver's correctness gate.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String]) {
  def run(spark: SparkSession, sfDir: String): DataFrame = fn(spark, sfDir)
}
