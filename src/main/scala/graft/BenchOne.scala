package graft

import org.apache.spark.sql.SparkSession

/** Single-query micro-bench for iteration: warm at sf0.001, min-of-2 at
  * sf0.1 per named query. `sbt "runMain graft.BenchOne q_x q_y"`. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().withExtensions(new GraftExtensions)
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args) {
      val fn = SparkEntry.queries(q)
      fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val (n, mem, disk) = graft.ops.Release.held(spark)
      graft.ops.Release.sweep(spark)
      println(f"ONE $q ${times.min}%.2f s  (held $n rdds ${(mem + disk) / 1048576} MB, swept)")
    }
    spark.stop()
  }
}
