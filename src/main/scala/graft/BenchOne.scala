package graft
import org.apache.spark.sql.SparkSession

/** Single-query bench: warmup at sf0.001, then min-of-3 noop writes at
  * the given SF dir — the inner loop for per-query plan iteration
  * without paying the full Bench sweep.
  * Run: `sbt "runMain graft.BenchOne <query> [sfDir]"`. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: BenchOne <query-name> [sfDir]  (one query per run)")
      sys.exit(2)
    }
    // parallelism from the env (default 28 preserves prior numbers):
    // hardcoded core counts bake machine-specific tuning into source
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "28")
    val spark = SparkSession.builder().withExtensions(new GraftExtensions)
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val name = args(0); val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val fn = SparkEntry.queries(name)
    fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
    graft.ops.Release.sweep(spark)
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"pass$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      graft.ops.Release.sweep(spark)
    }
    spark.stop()
  }
}
