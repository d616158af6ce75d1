package graft

import org.apache.spark.sql.functions._

/** The build-once / search-many contract of
  * [[graft.queries.Similarity.buildPqIndex]] /
  * [[graft.queries.Similarity.searchPqIndex]]: the stored index frame
  * plus the driver-side model state must be SUFFICIENT to reproduce
  * searches after a parquet round trip (the production layout: index
  * on the lake, codebooks with the job), and the index must stay
  * narrow — codes, never embeddings. */
class PqIndexSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sfDir)
  private lazy val queriesDf = emb.filter(col("vec_id") % 100 === 0)

  private def results(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
    df.select("q_id", "rank", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted

  test("stored index round-trips through parquet and searches identically") {
    val idx = queries.Similarity.buildPqIndex(emb, cells = 4, m = 4, ksub = 8)
    val direct = results(queries.Similarity.searchPqIndex(idx, emb, queriesDf))

    val dir = java.nio.file.Files.createTempDirectory("pqidx").toString
    idx.index.write.mode("overwrite").parquet(s"$dir/index")
    idx.cents.write.mode("overwrite").parquet(s"$dir/cents")
    val reloaded = idx.copy(
      cents = spark.read.parquet(s"$dir/cents"),
      index = spark.read.parquet(s"$dir/index"))
    val replayed = results(queries.Similarity.searchPqIndex(reloaded, emb, queriesDf))
    assert(direct == replayed,
      "reloaded index diverged from the in-session index")
    assert(direct.nonEmpty)
  }

  test("one index serves different probe/rescore settings without refit") {
    val idx = queries.Similarity.buildPqIndex(emb, cells = 4, m = 4, ksub = 8)
    val narrow = results(queries.Similarity.searchPqIndex(idx, emb, queriesDf,
      probes = 1, rescore = 10))
    val wide = results(queries.Similarity.searchPqIndex(idx, emb, queriesDf,
      probes = 4, rescore = Int.MaxValue))
    // exhaustive settings == brute-force top-k (the E7 oracle identity)
    val brute = results(queries.Similarity.annBruteforce(emb))
    assert(wide == brute, "exhaustive PQ search != brute force")
    // narrow settings stay well-formed even where recall drops
    assert(narrow.forall { case (_, rank, _) => rank >= 1 && rank <= 5 })
  }

  test("searches read the memo-persisted index, not a fresh full-corpus encode") {
    val idx = queries.Similarity.buildPqIndex(emb, cells = 4, m = 4, ksub = 8)
    val plan = queries.Similarity.searchPqIndex(idx, emb, queriesDf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan"),
      "PqIndex.index lost its persist — every search would re-encode the corpus")
  }

  test("pqIndexOnDisk: builds once, reloads across calls, searches like a fresh build") {
    // unique cacheKey per run so the first call exercises the build+write path
    val cacheKey = s"$sfDir#spec-${System.nanoTime()}"
    try {
      val fromDisk = queries.Similarity.pqIndexOnDisk(emb, cacheKey,
        cells = 4, m = 4, ksub = 8)
      val fresh = queries.Similarity.buildPqIndex(emb, cells = 4, m = 4, ksub = 8)
      // codebooks round-trip bit-exactly through the text sidecar
      assert(fromDisk.codebooks.map(_.toSeq.map(_.toSeq)) ==
        fresh.codebooks.map(_.toSeq.map(_.toSeq)),
        "codebooks diverged through the Double.toString round trip")
      val a = results(queries.Similarity.searchPqIndex(fromDisk, emb, queriesDf))
      val b = results(queries.Similarity.searchPqIndex(fresh, emb, queriesDf))
      assert(a == b, "disk-backed index searches differently from a fresh build")
      // second load must NOT rebuild: the artifact is complete on disk, so
      // a reload round-trips purely through the files and matches again
      val reload = queries.Similarity.pqIndexOnDisk(emb, cacheKey,
        cells = 4, m = 4, ksub = 8)
      assert(results(queries.Similarity.searchPqIndex(reload, emb, queriesDf)) == a)
    } finally {
      // the nanoTime key means no later run can ever reuse this
      // artifact — delete it or every test run leaks a dir in /tmp
      queries.Similarity.deleteRecursively(queries.Similarity.pqIndexDiskBase(
        cacheKey, cells = 4, m = 4, ksub = 8, dims = 64,
        seed = 0xC0FFEEL, maxIter = 20))
    }
  }

  test("the stored index is narrow: cell + m small codes, no embeddings") {
    val idx = queries.Similarity.buildPqIndex(emb, cells = 4, m = 4, ksub = 8)
    assert(idx.index.columns.toSeq == Seq("vec_id", "cell", "code"))
    val row = idx.index.select(col("code")).head()
    val codes = row.getSeq[Int](0)
    assert(codes.length == 4, s"expected m=4 codes, got ${codes.length}")
    assert(codes.forall(c => c >= 0 && c < 8), s"code out of ksub range: $codes")
  }
}
