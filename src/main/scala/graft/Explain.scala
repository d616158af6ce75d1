package graft

import org.apache.spark.sql.SparkSession

/** Single-query plan dump for iteration (the `.explain` twin of
  * [[BenchOne]]): `sbt "runMain graft.Explain q_x [sfDir]"`.
  * [[Plans]] regenerates the committed PLANS.md audit; this prints one
  * query's physical plan without touching the artifact. */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().withExtensions(new GraftExtensions)
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(args(0))(spark, args.lift(1).getOrElse("/root/testdata/sf0.1"))
    println(df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode))
    spark.stop()
  }
}
