package graft

import graft.queries.TextAnalysis
import org.apache.spark.sql.functions._

/** Token-window chunking boundary contract (C14): window/stride
  * arithmetic is where off-by-ones hide, so the exact chunk layout is
  * pinned for the tail, the exact-fit, the shorter-than-window, and
  * the empty cases. */
class ChunkSpec extends SparkSpec {

  import spark.implicits._

  // letter-only tokens: the tokenizer treats digits as separators
  private def toks(n: Int): String =
    (0 until n).map(i => s"${('a' + i / 26).toChar}${('a' + i % 26).toChar}").mkString(" ")

  private def layout(len: Int, window: Int, stride: Int): Seq[(Long, Long, Long)] = {
    val docs = Seq((1L, toks(len))).toDF("doc_id", "text")
    TextAnalysis.chunkTokens(docs, window, stride)
      .select(col("chunk_idx"), col("start_tok"), col("n_tokens"))
      .as[(Long, Long, Long)].collect().toSeq
  }

  test("tail chunk keeps the remainder; every token is covered") {
    // len 50, w 32, s 16 -> starts 1, 17, 33; last covers 18 tokens
    assert(layout(50, 32, 16) == Seq((0L, 1L, 32L), (1L, 17L, 32L), (2L, 33L, 18L)))
  }

  test("exact fit produces no empty tail chunk") {
    // len 32 == window -> one chunk; len 48 = w + s -> exactly two full
    assert(layout(32, 32, 16) == Seq((0L, 1L, 32L)))
    assert(layout(48, 32, 16) == Seq((0L, 1L, 32L), (1L, 17L, 32L)))
  }

  test("short and empty docs") {
    assert(layout(5, 32, 16) == Seq((0L, 1L, 5L)))
    val empty = Seq((1L, ""), (2L, "   .,;")).toDF("doc_id", "text")
    assert(TextAnalysis.chunkTokens(empty, 32, 16).count() == 0)
  }

  test("non-overlapping stride == window tiles the doc") {
    assert(layout(70, 32, 32) == Seq((0L, 1L, 32L), (1L, 33L, 32L), (2L, 65L, 6L)))
  }

  test("chunk_text is the sliced tokens; reassembly at stride==window reconstructs") {
    val docs = Seq((1L, toks(70))).toDF("doc_id", "text")
    val rebuilt = TextAnalysis.chunkTokens(docs, 32, 32)
      .orderBy("chunk_idx").select("chunk_text").as[String].collect().mkString(" ")
    assert(rebuilt == toks(70))
  }

  test("gap strides are rejected") {
    val docs = Seq((1L, toks(10))).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkTokens(docs, window = 8, stride = 9)
    }
  }
}
