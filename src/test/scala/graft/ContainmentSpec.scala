package graft

/** Semantic contract of [[graft.queries.Dedup.containmentPairs]] (D12):
  * the asymmetric inclusion case — a short doc verbatim inside a long
  * one — must clear the containment gate while staying invisible to
  * the Jaccard gate at the same threshold. Cross-engine hashing lives
  * in the DuckDB oracle row. */
class ContainmentSpec extends SparkSpec {

  import spark.implicits._

  // quote: 6 tokens -> 4 distinct 3-shingles, ALL present in host
  // (quote is a verbatim span of host); host has 26 tokens -> 24
  // shingles, so J = 4/24 ≈ 0.17 but C(quote→host) = 1.0
  private val quote = "alpha beta gamma delta epsilon zeta"
  private val host = ("one two three four five six seven eight nine ten " +
    quote + " eleven twelve thirteen fourteen fifteen sixteen seventeen " +
    "eighteen nineteen twenty").replaceAll("\\s+", " ")
  private lazy val docs = Seq(
    (1L, quote),
    (2L, host),
    (3L, "totally unrelated content with no shared shingles at all here")
  ).toDF("doc_id", "text")

  test("a verbatim quote is full-containment but low-Jaccard") {
    val cont = queries.Dedup.containmentPairs(docs, minContainment = 0.9).collect()
    assert(cont.length == 1, s"expected exactly the quote-host pair, got ${cont.length}")
    val r = cont.head
    assert(r.getAs[Long]("id_a") == 1L && r.getAs[Long]("id_b") == 2L)
    assert(r.getAs[Double]("containment_a") == 1.0,
      s"quote not fully contained: ${r.getAs[Double]("containment_a")}")
    assert(r.getAs[Double]("containment_b") < 0.5,
      "host containment should be small (host is much longer)")
    // the same pair is invisible to Jaccard at the same threshold
    val jac = queries.Dedup.jaccardPairs(docs, minJaccard = 0.9).collect()
    assert(jac.isEmpty, "Jaccard flagged the asymmetric pair at 0.9")
  }

  test("unrelated docs never pair; threshold gates candidates") {
    val all = queries.Dedup.containmentPairs(docs, minContainment = 0.01).collect()
    assert(!all.exists(r => r.getAs[Long]("id_a") == 3L || r.getAs[Long]("id_b") == 3L),
      "disjoint doc produced a containment pair")
  }

  private def pairs(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
    df.select("id_a", "id_b", "n_common")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted

  test("prefix-filtered containment is lossless vs the naive join") {
    // the asymmetric quote-host pair is the case the prefix filter
    // must NOT lose: the quote (smaller side) prefixes; the host's
    // full list catches it — plus the documents corpus for breadth.
    // Shift the synthetic ids clear of the corpus id range: a doc_id
    // collision would merge shingle sets and invalidate both plans.
    import org.apache.spark.sql.functions.col
    val corpus = Tables.documents(spark, sfDir).select("doc_id", "text")
      .unionByName(docs.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    for (t <- Seq(0.3, 0.5, 0.9)) {
      val naive = pairs(queries.Dedup.containmentPairs(corpus, t))
      val pref = pairs(queries.Dedup.containmentPairsPrefix(corpus, t))
      assert(pref == naive,
        s"prefix filter diverged from naive at t=$t: " +
          s"${pref.size} vs ${naive.size} pairs")
      if (t <= 0.5) assert(naive.nonEmpty, s"empty differential at t=$t proves nothing")
    }
  }
}
