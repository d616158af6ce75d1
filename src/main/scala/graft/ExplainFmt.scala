package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Formatted-plan dumper for the optimization-round artifacts:
  * `sbt "runMain graft.ExplainFmt <outDir> <suffix> q_a q_b ..."` writes
  * `<outDir>/<query>_<suffix>.txt` with `.explain("formatted")` output
  * for each named query — the before/after plan evidence the round's
  * OPTIMIZATION notes reference. */
object ExplainFmt {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ExplainFmt <outDir> <suffix> <query>...")
    val (outDir, suffix) = (args(0), args(1))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().withExtensions(new GraftExtensions)
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    new java.io.File(outDir).mkdirs()
    args.drop(2).foreach { name =>
      val plan = SparkEntry.queries(name)(spark, d)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
      println(s"wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
