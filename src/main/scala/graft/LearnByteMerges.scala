package graft

import org.apache.spark.sql.SparkSession

/** Regenerates the committed byte-level merge table
  * (queries.LearnedByteMergesTable / ByteTokenizer.LearnedByteMerges):
  * runs the C30 trainer on a testdata SF dir and prints the table as
  * Scala source plus a per-depth BYTE-fertility profile (tokens per
  * UTF-8 byte over the corpus's distinct runs, run-frequency
  * weighted), so the committed artifact is reproducible bit-for-bit
  * from the data. Run: `sbt "runMain graft.LearnByteMerges [sfDir] [budget]"`. */
object LearnByteMerges {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val budget = args.lift(1).map(_.toInt).getOrElse(512)
    val spark = SparkSession.builder().withExtensions(new GraftExtensions)
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, sfDir)
    val merges = queries.ByteTokenizer.learnByteMerges(docs, budget)
    println(s"// learned ${merges.size} byte merges (budget $budget) from $sfDir")
    // run census: every distinct run with its corpus frequency — the
    // byte-fertility profile weights by it so the printed number is
    // the corpus's own tokens-per-byte, not a uniform-dict average
    val runs = docs
      .select(org.apache.spark.sql.functions
        .explode(queries.ByteTokenizer.runsCol).as("run"))
      .groupBy("run").count()
      .collect().map(r => (r.getString(0), r.getLong(1)))
    for (d <- Seq(16, 32, 64, 96, 100, 128, 160, 256, merges.size).distinct.sorted
        if d <= merges.size) {
      val ranks = merges.take(d).map(_._1).zipWithIndex.toMap
      var toks = 0L
      var bytes = 0L
      var multi = 0
      runs.foreach { case (run, n) =>
        val len = queries.ByteTokenizer.encodeRun(run, ranks).length
        toks += len.toLong * n
        bytes += run.getBytes(java.nio.charset.StandardCharsets.UTF_8).length.toLong * n
        if (len > 1) multi += 1
      }
      println(f"// depth $d%4d: corpus fertility ${toks.toDouble / bytes}%.3f tok/byte, " +
        s"runs still multi-token: $multi/${runs.length}")
    }
    println(merges.map { case ((l, r), _) => s"""("$l", "$r")""" }
      .grouped(3).map(_.mkString(", ")).mkString(",\n    "))
    spark.stop()
  }
}
