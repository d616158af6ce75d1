package graft

import graft.queries.Shards
import org.apache.spark.sql.functions._

/** H14 [[Shards.packBestFit]] — the harmonic-shelf packing contract:
  * whole docs only (nothing split), no bin overflow, the shelf waste
  * bound per class, dense deterministic bin ids, and the stats row's
  * arithmetic tying out against the assignment. */
class PackBestFitSpec extends SparkSpec {
  import spark.implicits._

  private val L = 64L
  private lazy val docs = Tables.documents(spark, sfDir)
  private lazy val packed = Shards.packBestFit(docs, L).cache()

  test("every doc lands in exactly one bin — nothing is split") {
    assert(packed.count() == docs.count())
    assert(packed.groupBy("doc_id").count().filter(col("count") > 1).count() == 0)
  }

  test("no regular bin overflows contextLen") {
    val over = packed.filter(col("size_class") >= 1L)
      .groupBy("bin_id").agg(sum("n_tokens").as("fill"))
      .filter(col("fill") > L)
    assert(over.count() == 0, over.collect().mkString(", "))
  }

  test("shelf waste bound: every non-last bin of class c is > c/(c+1) full") {
    val bins = packed.filter(col("size_class") >= 1L)
      .groupBy("size_class", "bin_id")
      .agg(sum("n_tokens").as("fill"), count(lit(1)).as("n_docs"))
    val lastPerClass = bins.groupBy("size_class")
      .agg(max("bin_id").as("bin_id"))
    val nonLast = bins.join(lastPerClass, Seq("size_class", "bin_id"), "left_anti")
    // a non-last class-c bin holds exactly c docs, each > L/(c+1) tokens
    val viol = nonLast.filter(
      col("n_docs") =!= col("size_class") ||
        col("fill") * (col("size_class") + 1) <= lit(L) * col("size_class"))
    assert(viol.count() == 0, viol.collect().mkString(", "))
  }

  test("oversize docs sit alone in their bins; empty docs get bin -1") {
    val tiny = Seq(
      (1L, ("x " * 100).trim), // 100 tokens > L=64 -> oversize
      (2L, ("y " * 70).trim),  // oversize
      (3L, ""),                // empty
      (4L, "a b c"),           // 3 tokens, class 21
      (5L, "d e f")
    ).toDF("doc_id", "text")
    val out = Shards.packBestFit(tiny, L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(1L) == ((0L, 0L, 0L)))   // class 0, first bin, alone
    assert(out(2L) == ((0L, 1L, 0L)))   // class 0, own bin
    assert(out(3L) == ((-1L, -1L, 0L)))
    assert(out(4L)._1 == 21L && out(4L)._2 == out(5L)._2) // share a bin
    assert(out(4L)._3 == 0L && out(5L)._3 == 1L)          // slots in id order
  }

  test("bin ids are dense from 0") {
    val ids = packed.filter(col("bin_id") >= 0L)
      .select("bin_id").distinct()
    val n = ids.count()
    assert(ids.agg(min("bin_id"), max("bin_id")).head() ==
      org.apache.spark.sql.Row(0L, n - 1))
  }

  test("deterministic under adversarial repartition") {
    val a = packed.orderBy("doc_id").collect().toSeq
    val b = Shards.packBestFit(docs.repartition(13), L)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("stats row ties out against the assignment; chop splits docs, best-fit never") {
    val s = Shards.packBestFitStats(docs, L).head()
    val bins = packed.filter(col("size_class") >= 1L)
      .groupBy("bin_id").agg(sum("n_tokens").as("fill"))
    val nBins = bins.count()
    val packedToks = bins.agg(sum("fill")).head().getLong(0)
    assert(s.getLong(0) == nBins)
    assert(s.getLong(1) == packedToks)
    assert(s.getLong(2) == nBins * L - packedToks) // waste arithmetic
    // the trade: concat-and-chop splits real docs on this corpus
    assert(s.getLong(5) > 0L, "chop splits no docs — corpus degenerate?")
  }
}
