package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.{polyHash, words}
import graft.queries.Blocks

/** Block-level exact dedup (SURVEY.md §2 D10) semantics. */
class BlocksSpec extends SparkSpec {

  import spark.implicits._

  test("planted exact dup keeps zero blocks; first occurrence keeps all") {
    // globally-unique LETTER-ONLY tokens (digits are separators to the
    // tokenizer) so block content collides only via the planted dup
    val text = (0 until 2 * Blocks.BlockWords)
      .map(i => "uniq" + ('a' + i).toChar).mkString(" ")
    val docs = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
    val out = Blocks.blockDedup(docs)
      .select("doc_id", "n_blocks", "n_kept", "kept_hash")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap

    val (_, nb1, nk1, kh1) = out(1L)
    assert(nb1 == 2L && nk1 == nb1, "first occurrence must keep every block")
    // its reassembled text == its own token join, so the hash matches
    val direct = docs.filter($"doc_id" === 1)
      .select(polyHash(array_join(words($"text"), " ")).as("h"))
      .as[Long].head()
    assert(kh1 == direct)

    val (_, nbDup, nkDup, khDup) = out(2L)
    assert(nbDup == nb1, "same text, same block count")
    assert(nkDup == 0L, "every block already seen at doc 1")
    assert(khDup == 0L, "empty surviving text hashes to 0")
  }

  test("cross-doc shared block is excised exactly once, unique tails survive") {
    val shared = (0 until Blocks.BlockWords)
      .map(i => "tok" + ('a' + i).toChar).mkString(" ")
    val docs = Seq(
      (1L, s"$shared alpha beta gamma delta epsilon zeta eta theta"),
      (2L, s"$shared iota kappa lambda mu nu xi omicron pi"))
      .toDF("doc_id", "text")
    val out = Blocks.blockDedup(docs)
      .select("doc_id", "n_blocks", "n_kept")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 2L, 2L)))
    assert(out(2L) == ((2L, 2L, 1L)), "doc 2 loses only the shared block")
  }

  test("block accounting: sum(n_kept) == distinct block instances globally") {
    val docs = Tables.documents(spark, sfDir)
    val out = Blocks.blockDedup(docs)
    val (totBlocks, totKept) = out
      .agg(sum("n_blocks"), sum("n_kept")).as[(Long, Long)].head()
    val B = Blocks.BlockWords
    val distinctBlocks = docs
      .select(posexplode(transform(
        sequence(lit(0), ((size(words($"text")) + (B - 1)) / B).cast("int") - 1),
        i => array_join(slice(words($"text"), i * B + 1, lit(B)), " "))))
      .select(countDistinct($"col")).as[Long].head()
    assert(totKept == distinctBlocks, "one survivor per distinct block content")
    assert(totKept <= totBlocks)
  }
}
