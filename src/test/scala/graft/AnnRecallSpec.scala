package graft

import graft.queries.Similarity

/** E2/E3: the approximate searchers trade recall for candidate volume —
  * assert the trade lands where the design predicts (vs the exact E1
  * baseline) and that outputs are well-formed. */
class AnnRecallSpec extends SparkSpec {

  private def pairs(name: String): Set[(Long, Long)] =
    SparkEntry.queries(name)(spark, sfDir)
      .select("q_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  lazy val exact: Set[(Long, Long)] = pairs("q_ann_bruteforce")

  test("brute force returns full top-5 for every query") {
    assert(exact.size == 25) // 5 queries x 5 neighbors at sf0.001
  }

  test("recallAtK: identity is 1.0, disjoint is 0.0, absent queries count") {
    import spark.implicits._
    import graft.queries.Similarity
    val exact = Seq((1L, 1L, 10L), (1L, 2L, 11L), (2L, 1L, 20L))
      .toDF("q_id", "rank", "neighbor_id")
    val self = Similarity.recallAtK(exact, exact).collect()
    assert(self.forall(_.getDouble(3) == 1.0), self.toSeq)
    // approx missed q2 entirely and half of q1
    val approx = Seq((1L, 1L, 10L), (1L, 2L, 99L))
      .toDF("q_id", "rank", "neighbor_id")
    val out = Similarity.recallAtK(approx, exact).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) == ((2L, 1L, 0.5)) && out(2L) == ((1L, 0L, 0.0)), out)
  }

  test("q_ann_recall row equals this spec's own recall arithmetic") {
    val row = SparkEntry.queries("q_ann_recall")(spark, sfDir)
      .agg(org.apache.spark.sql.functions.sum("n_hit")).head().getLong(0)
    assert(row.toDouble == (exact & pairs("q_ann_lsh")).size.toDouble,
      s"q_ann_recall hits $row vs set arithmetic")
  }

  test("LSH recall exceeds the multi-table design floor") {
    val got = pairs("q_ann_lsh")
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.15, s"LSH recall $recall")
  }

  test("IVF recall with 3-probe search") {
    val got = pairs("q_ann_ivf")
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.4, s"IVF recall $recall")
  }

  test("trained-centroid IVF reaches the probe-count recall floor, deterministically") {
    val run1 = graft.queries.Similarity
      .annIvfTrained(Tables.embeddings(spark, sfDir))
      .select("q_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & run1).size.toDouble / exact.size
    assert(recall >= 0.4, s"trained IVF recall $recall")
    // seeded fit + deterministic search: a second run must be identical
    val run2 = graft.queries.Similarity
      .annIvfTrained(Tables.embeddings(spark, sfDir))
      .select("q_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(run1 == run2, "trained IVF is not run-to-run deterministic")
  }

  test("IVF-PQ with exact rescore reaches the trained-IVF recall floor, deterministically") {
    def run(): Set[(Long, Long)] = graft.queries.Similarity
      .annIvfPq(Tables.embeddings(spark, sfDir))
      .select("q_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val run1 = run()
    // the ADC stage only SHORTLISTS (top-50 of ~N/cells·probes
    // candidates); exact rescore then ranks, so recall is bounded by
    // cell-probing (the trained-IVF floor), not by quantization error
    val recall = (exact & run1).size.toDouble / exact.size
    assert(recall >= 0.4, s"IVF-PQ recall $recall")
    assert(run1 == run(), "IVF-PQ is not run-to-run deterministic")
  }

  test("IVF-PQ output is well-formed: self-free, rank-bounded, full top-5 per query") {
    val df = graft.queries.Similarity.annIvfPq(Tables.embeddings(spark, sfDir))
    assert(df.filter("q_id = neighbor_id").count() == 0)
    assert(df.filter("rank < 1 or rank > 5").count() == 0)
  }

  test("banded embedding dedup recovers the brute-force threshold pairs") {
    // sf0.01 plants exactly one cos >= 0.5 pair (sf0.001 has none);
    // 16 tables x 4 bits has ~0.97 theoretical recall at the threshold,
    // so missing it would be a (16x repeated) 3%-tail event — a bug.
    def dedupPairs(name: String): Set[(Long, Long)] =
      SparkEntry.queries(name)(spark, "/root/testdata/sf0.01")
        .select("id_a", "id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactDup = dedupPairs("q_dedup_embedding")
    val banded = dedupPairs("q_dedup_embedding_lsh")
    assert(exactDup.nonEmpty, "test corpus lost its planted cosine pair")
    assert(banded.subsetOf(exactDup), "banded rescore admitted a sub-threshold pair")
    assert((exactDup & banded).size.toDouble / exactDup.size >= 0.9,
      s"banded dedup recall ${(exactDup & banded).size}/${exactDup.size}")
  }

  test("approximate rankings are subsets of the vector universe, self-free") {
    for (q <- Seq("q_ann_lsh", "q_ann_ivf")) {
      val df = SparkEntry.queries(q)(spark, sfDir)
      assert(df.filter("q_id = neighbor_id").count() == 0, q)
      assert(df.filter("rank < 1 or rank > 5").count() == 0, q)
    }
  }

  test("hard negatives: every row is a genuine different-label neighbor; probe-limited recall holds") {
    val emb = Tables.embeddings(spark, sfDir)
    val exh = Similarity.hardNegatives(emb, cells = 10, probes = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    // label-inequality is structural: join back and check every pair
    val labels = emb.collect().map(r => r.getLong(0) -> r.getInt(2).toLong).toMap
    assert(exh.forall { case (q, n) => labels(q) != labels(n) })
    // probe-limited mining keeps the E3 probe-regime recall floor
    val probed = Similarity.hardNegatives(emb, cells = 10, probes = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exh intersect probed).size.toDouble / exh.size
    assert(recall >= 0.4, s"hard-negative probe recall $recall")
  }

  test("E19 operating curve: recall is monotone in probes and the exhaustive arm is exact") {
    val emb = Tables.embeddings(spark, sfDir)
    val curve = Similarity.annOperatingCurve(emb)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(curve.map(_._1).toSeq == Seq(1L, 2L, 3L, 10L))
    // one truth set shared by every arm
    assert(curve.map(c => (c._2, c._3)).distinct.size == 1)
    // recall never decreases as probes grow (candidate sets are nested)
    curve.sliding(2).foreach { case Array(a, b) =>
      assert(a._5 <= b._5 + 1e-12,
        s"recall fell from probes=${a._1} (${a._5}) to probes=${b._1} (${b._5})")
    }
    // probing EVERY cell is brute force: the last arm must be exact
    assert(curve.last._5 == 1.0 && curve.last._4 == curve.last._3,
      s"exhaustive arm not exact: ${curve.last}")
  }
}
