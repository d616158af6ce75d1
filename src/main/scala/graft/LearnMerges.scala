package graft

import org.apache.spark.sql.SparkSession

/** Regenerates the committed learned-merge table (Tokenizer.LearnedMerges):
  * runs the C13 trainer on a testdata SF dir and prints the table as
  * Scala source plus a per-depth fertility profile, so the committed
  * artifact is reproducible bit-for-bit from the data.
  * Run: `sbt "runMain graft.LearnMerges [sfDir] [budget]"`. */
object LearnMerges {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val budget = args.lift(1).map(_.toInt).getOrElse(512)
    val spark = SparkSession.builder().withExtensions(new GraftExtensions)
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, sfDir)
    val merges = queries.Tokenizer.bpeLearnMerges(docs, budget)
    println(s"// learned ${merges.size} merges (budget $budget) from $sfDir")
    // fertility profile: mean BPE tokens/word over the dict at several
    // truncation depths — shows where encoding saturates to 1 token/word
    val words = docs
      .select(org.apache.spark.sql.functions.explode(
        graft.functions.TextFunctions.words(
          org.apache.spark.sql.functions.col("text"))).as("w"))
      .distinct().collect().map(_.getString(0))
    for (d <- Seq(16, 32, 64, 96, 128, 160, 192, 256, merges.size).distinct.sorted
        if d <= merges.size) {
      val ranks = merges.take(d).map(_._1).zipWithIndex.toMap
      val lens = words.map(w => queries.Tokenizer.encodeWord(w, ranks).length)
      println(f"// depth $d%4d: mean fertility ${lens.sum.toDouble / lens.length}%.3f, " +
        s"words at 1 token: ${lens.count(_ == 1)}/${lens.length}")
    }
    println(merges.map { case ((l, r), _) => s"""("$l", "$r")""" }
      .grouped(4).map(_.mkString(", ")).mkString(",\n    "))
    spark.stop()
  }
}
