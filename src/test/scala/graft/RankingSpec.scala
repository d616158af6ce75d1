package graft

import graft.queries.Ranking
import org.apache.spark.sql.functions._

class RankingSpec extends SparkSpec {

  test("topTerms ranks by tf desc, then rarity, then term") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple apple apple banana banana cherry"),
      (2L, "banana cherry cherry date")
    ).toDF("doc_id", "text")
    val got = Ranking.topTerms(docs, k = 3)
      .select("doc_id", "term", "tf", "df", "rank")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq(
      // doc 1: apple tf=3; banana tf=2; cherry tf=1
      (1L, "apple", 3L, 1L, 1L), (1L, "banana", 2L, 2L, 2L), (1L, "cherry", 1L, 2L, 3L),
      // doc 2: cherry tf=2; banana/date tf=1 — date (df=1) is rarer than banana (df=2)
      (2L, "cherry", 2L, 2L, 1L), (2L, "date", 1L, 1L, 2L), (2L, "banana", 1L, 2L, 3L)))
  }

  test("tfidf score is tf * ln(N/df)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha alpha beta"),
      (2L, "beta gamma")
    ).toDF("doc_id", "text")
    val got = Ranking.tfidf(docs)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(4)).toMap
    assert(got((1L, "alpha")) == 2.0 * math.log(2.0 / 1.0))
    assert(got((1L, "beta")) == 1.0 * math.log(2.0 / 2.0))
    assert(got((2L, "gamma")) == 1.0 * math.log(2.0 / 1.0))
  }

  test("unigramXent: uniform corpus scores ln(V); rare-word docs score higher") {
    import spark.implicits._
    // 4 docs x 2 tokens, every term distinct => p(t) = 1/8 for all,
    // xent = ln 8 exactly, for every doc
    val uniform = Seq(
      (1L, "a b"), (2L, "c d"), (3L, "e f"), (4L, "g h")
    ).toDF("doc_id", "text")
    val xs = Ranking.unigramXent(uniform)
      .select("xent").collect().map(_.getDouble(0))
    assert(xs.length == 4)
    xs.foreach(x => assert(math.abs(x - math.log(8.0)) < 1e-12))

    // a doc of corpus-common words scores LOWER than a doc of hapaxes
    val skewed = Seq(
      (1L, "the the the the the the the the"),
      (2L, "qux zot frob wib nib crab drel yab")
    ).toDF("doc_id", "text")
    val byId = Ranking.unigramXent(skewed)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(byId(1L) < byId(2L))
    // exact: doc1 xent = -ln(8/16) = ln 2; doc2 terms each ct=1 => ln 16
    assert(math.abs(byId(1L) - math.log(2.0)) < 1e-12)
    assert(math.abs(byId(2L) - math.log(16.0)) < 1e-12)
  }

  test("unigramXent n_tokens matches doc length and fold order is stable") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma alpha"),
      (2L, "beta beta delta")
    ).toDF("doc_id", "text")
    val rows = Ranking.unigramXent(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(r => r._1 -> r._2).toMap == Map(1L -> 4L, 2L -> 3L))
    // hand-compute doc 2 with the same left-fold term order (beta, delta):
    // p(beta)=3/7, p(delta)=1/7; fold = (0 + 2*ln(3/7)) + 1*ln(1/7)
    val expect = -((0.0 + 2 * math.log(3.0 / 7.0)) + math.log(1.0 / 7.0)) / 3.0
    val got = rows.find(_._1 == 2L).get._3
    assert(got == expect)
  }

  test("searchBm25: more hits and rarer terms rank higher; misses excluded") {
    import spark.implicits._
    val filler = "lorem ipsum dolor sit amet consectetur"
    val docs = Seq(
      (1L, s"spark window $filler"),        // two query terms
      (2L, s"spark $filler"),               // one common term
      (3L, s"$filler $filler"),             // no query terms -> excluded
      (4L, s"spark spark window window $filler") // highest tf on both
    ).toDF("doc_id", "text")
    val got = Ranking.searchBm25(docs, Seq("spark", "window"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._1).toSet == Set(1L, 2L, 4L))
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(4L)._3 > byId(1L)._3 && byId(1L)._3 > byId(2L)._3)
    assert(byId(1L)._2 == 2L && byId(2L)._2 == 1L)
    // results arrive ordered by score desc
    assert(got.map(_._3).toSeq == got.map(_._3).sortBy(-_).toSeq)
  }

  test("topTerms plan rewrites the rank window to the bounded-heap TopKPerKey operator") {
    val plan = Ranking.topTerms(Tables.documents(spark, sfDir))
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"expected TopKPerKey in:\n$plan")
  }

  test("searchBm25 rejects duplicate or empty term lists") {
    import spark.implicits._
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](Ranking.searchBm25(docs, Seq.empty))
    intercept[IllegalArgumentException](Ranking.searchBm25(docs, Seq("a", "a")))
  }

  test("hybridSearch: a verbatim twin tops both retrievers and the fused list") {
    import spark.implicits._
    val q = "red fox jumps over lazy dog near quiet river bank today"
    val docs = Seq(
      0L -> q,                                                // the query doc
      7L -> q,                                                // verbatim twin
      8L -> "red fox jumps over lazy dog near big noisy road today",
      9L -> "green bird sings under bright warm sun every single morning",
      11L -> "blue fish swims beside tall dark rocks during cold night")
      .toDF("doc_id", "text")
    val out = Graft.hybridSearch(docs, qMod = 250L, poolK = 4, k = 4)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3),
        r.getInt(4), r.getInt(5)))
    assert(out.forall(_._1 == 0L), s"only doc 0 queries at qMod 250: ${out.toSeq}")
    assert(out.forall(_._3 != 0L), "self-matches must be excluded")
    val top = out.find(_._2 == 1).get
    assert(top._3 == 7L && top._5 == 1 && top._6 == 1,
      s"the verbatim twin must lead both rankings and the fusion: ${out.toSeq}")
    // rrf is exactly the two reciprocal terms of the reported ranks
    out.foreach { case (_, _, _, rrf, rt, rv) =>
      val want = (if (rt > 0) 1.0 / (60.0 + rt) else 0.0) +
        (if (rv > 0) 1.0 / (60.0 + rv) else 0.0)
      assert(rrf == want, s"rrf $rrf != recomputed $want for ranks ($rt, $rv)")
    }
    // ranks are dense from 1 and ordered
    assert(out.map(_._2).sorted.toSeq == (1 to out.length).toSeq)
    // deterministic across partitionings
    val again = Graft.hybridSearch(docs.repartition(7), qMod = 250L,
      poolK = 4, k = 4).collect().map(_.toSeq).toSeq
    assert(again == out.map(p => Seq(p._1, p._2, p._3, p._4, p._5, p._6)).toSeq
      .map(identity), "hybridSearch must be partitioning-invariant")
    graft.ops.Release.sweep(spark)
  }

  test("hybridSearchLsh: exhaustive buckets equal the dense form; real buckets keep the twin") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    // bits = 0: every pair is a candidate -> MUST equal hybridSearch
    // row-for-row (the oracle row's losslessness claim, checked here
    // at a second configuration: more tables, smaller qMod pool)
    val dense = Graft.hybridSearch(docs, qMod = 50L, poolK = 10, k = 5)
      .collect().map(_.toSeq).toSeq
    val exhaustive = Graft.hybridSearchLsh(docs, qMod = 50L, poolK = 10, k = 5,
      tables = 3, bits = 0).collect().map(_.toSeq).toSeq
    assert(exhaustive == dense,
      s"exhaustive-bucket hybrid diverged: ${exhaustive.size} vs ${dense.size}")
    // real buckets at production-ish settings: a verbatim twin shares
    // every projection sign with its query, so it survives bucketing
    // and must still fuse at rank 1
    val q = "red fox jumps over lazy dog near quiet river bank today"
    val planted = Seq(
      0L -> q, 7L -> q,
      8L -> "red fox jumps over lazy dog near big noisy road today",
      9L -> "green bird sings under bright warm sun every single morning",
      11L -> "blue fish swims beside tall dark rocks during cold night")
      .toDF("doc_id", "text")
    val out = Graft.hybridSearchLsh(planted, qMod = 250L, poolK = 4, k = 4,
      tables = 8, bits = 4).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.find(_._2 == 1).get._3 == 7L,
      s"verbatim twin must fuse at rank 1 through real buckets: ${out.toSeq}")
    graft.ops.Release.sweep(spark)
  }
}
