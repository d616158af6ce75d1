package graft

import org.apache.spark.sql.SparkSession

/** Regenerates the committed unigram piece table
  * ([[graft.queries.LearnedPiecesTable]]): runs the C27 trainer on a
  * testdata SF dir and prints the table as Scala source plus a
  * fertility profile, so the committed artifact is reproducible
  * bit-for-bit from the data (StrictMath-quantized scores).
  * Run: `sbt "runMain graft.LearnPieces [sfDir] [vocabSize]"`. */
object LearnPieces {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val vocabSize = args.lift(1).map(_.toInt).getOrElse(160)
    val spark = SparkSession.builder().withExtensions(new GraftExtensions)
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, sfDir)
    val pieces = queries.Unigram.learnPieces(docs, vocabSize)
    println(s"// learned ${pieces.size} pieces (vocabSize $vocabSize) from $sfDir")
    val dictWords = docs
      .select(org.apache.spark.sql.functions.explode(
        graft.functions.TextFunctions.words(
          org.apache.spark.sql.functions.col("text"))).as("w"))
      .distinct().collect().map(_.getString(0))
    val lens = dictWords.map(w => queries.Unigram.encodeWord(w, pieces).length)
    println(f"// mean fertility ${lens.sum.toDouble / lens.length}%.3f over ${lens.length} distinct words, " +
      s"words at 1 piece: ${lens.count(_ == 1)}, max word len: ${dictWords.map(_.length).max}")
    println(pieces.map { case (p, q) => s"""("$p", ${q}L)""" }
      .grouped(4).map(_.mkString(", ")).mkString(",\n    "))
    spark.stop()
  }
}
