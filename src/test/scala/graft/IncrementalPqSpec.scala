package graft

import org.apache.spark.sql.functions._
import graft.queries.Similarity

/** E8 [[graft.queries.Similarity.appendToPqIndex]]: incremental index
  * growth without refit. The load-bearing check is the E7 losslessness
  * trick — with every cell probed and an untruncated shortlist, search
  * output over the APPENDED index must equal brute force over the
  * union, whatever cells/codes the append assigned — plus batch-split
  * invariance and the enforced contracts. */
class IncrementalPqSpec extends SparkSpec {

  private lazy val all = Tables.embeddings(spark, sfDir)
  private lazy val half = all.filter(col("vec_id") % 2 === 0)
  private lazy val rest = all.filter(col("vec_id") % 2 === 1)
  private lazy val idxHalf =
    Similarity.buildPqIndex(half, cells = 4, m = 4, ksub = 8, maxIter = 4)

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.toSeq.toList).toSet

  test("append + exhaustive probing equals brute force over the union") {
    val grown = Similarity.appendToPqIndex(idxHalf, rest)
    val queries = all.filter(col("vec_id") % 100 === 0)
    val got = Similarity.searchPqIndex(grown, all, queries,
      probes = 4, rescore = Int.MaxValue)
    val want = Similarity.annBruteforce(all)
    assert(rows(got) == rows(want))
  }

  test("appending in two batches equals appending in one") {
    val once = Similarity.appendToPqIndex(idxHalf, rest).index
    val b1 = rest.filter(col("vec_id") % 4 === 1)
    val b2 = rest.filter(col("vec_id") % 4 === 3)
    val twice =
      Similarity.appendToPqIndex(Similarity.appendToPqIndex(idxHalf, b1), b2).index
    assert(rows(once) == rows(twice))
  }

  test("appended rows carry the same narrow schema as built rows") {
    val grown = Similarity.appendToPqIndex(idxHalf, rest)
    // names + types (build and append now share assignCellsAndCodes,
    // but nullability metadata can still differ through the memo)
    assert(grown.index.schema.map(f => (f.name, f.dataType)) ==
      idxHalf.index.schema.map(f => (f.name, f.dataType)))
    val perCell = grown.index.groupBy("cell").count().collect()
      .map(r => r.getLong(0)).toSet
    assert(perCell.subsetOf((0L until 4L).toSet), s"cells out of range: $perCell")
    assert(grown.index.count() == all.count())
  }

  test("an id already in the index fails the append loudly") {
    val e = intercept[Exception] {
      // consume the guarded column: the assert is folded into `cell`,
      // and a count() would let the optimizer skip column evaluation
      Similarity.appendToPqIndex(idxHalf, half.limit(5))
        .index.agg(sum(col("cell"))).head()
    }
    assert(e.getMessage != null && e.getMessage.contains("overlap"),
      s"wrong failure: ${e.getMessage}")
  }

  test("a duplicate vec_id WITHIN the batch fails loudly") {
    // the cells agg would collapse the duplicates while the codes side
    // keeps both rows — two index rows for one key, the exact state
    // the scaladoc forbids; enforced in-plan like the overlap guard
    val three = rest.filter(col("vec_id").isin(1L, 3L, 5L))
    val doubled = three.unionByName(three)
    val e = intercept[Exception] {
      Similarity.appendToPqIndex(idxHalf, doubled)
        .index.agg(sum(col("cell"))).head()
    }
    assert(e.getMessage != null && e.getMessage.contains("duplicate"),
      s"wrong failure: ${e.getMessage}")
  }

  test("zero-norm and infinite batch vectors fail loudly, not as opaque cast errors") {
    import spark.implicits._
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    for (bad <- Seq(Seq.fill(64)(0f),
        Seq(Float.PositiveInfinity) ++ Seq.fill(63)(1f),
        Seq(Float.NaN) ++ Seq.fill(63)(1f))) {
      val frame = Seq((900002L, bad)).toDF("vec_id", "embedding")
      val e = intercept[Exception] {
        Similarity.appendToPqIndex(idxHalf, frame)
          .index.agg(sum(col("cell"))).head()
      }
      assert(msgs(e).exists(_.contains("zero or non-finite")), e)
    }
  }

  test("a dims mismatch fails fast; an empty batch is a no-op") {
    import spark.implicits._
    val ragged = Seq((900001L, Seq(1f, 2f))).toDF("vec_id", "embedding")
    assertThrows[IllegalArgumentException] {
      Similarity.appendToPqIndex(idxHalf, ragged)
    }
    // a nightly append job legitimately sees zero new vectors some
    // nights — the contract is "unchanged index back", not a throw
    val unchanged = Similarity.appendToPqIndex(idxHalf, all.filter(lit(false)))
    assert(unchanged eq idxHalf)
  }
}
