package graft

import org.apache.spark.sql.functions._

/** Contract of [[graft.queries.TextAnalysis.collocations]] (C12):
  * PMI math on a hand-computable corpus, the minCount gate, the
  * pmi == ln(lift) relationship, and descending-lift order. The
  * cross-engine hash contract lives in the DuckDB oracle row. */
class CollocationSpec extends SparkSpec {

  import spark.implicits._

  // "alpha beta" appears in every doc (a collocation); "alpha gamma"
  // once (below minCount); fillers vary so counts differ per word
  private lazy val docs = Seq(
    (1L, "alpha beta filler one"),
    (2L, "alpha beta filler two"),
    (3L, "alpha beta other filler"),
    (4L, "alpha gamma beta filler"),
    (5L, "alpha beta filler filler"),
    (6L, "alpha beta one two")
  ).toDF("doc_id", "text")

  test("PMI of a planted collocation matches the hand computation") {
    val out = queries.TextAnalysis.collocations(docs, minCount = 5L, topN = 10)
      .collect()
    val ab = out.find(_.getAs[String]("bigram") == "alpha beta").get
    // counts by hand: 6 docs x 4 tokens = 24 unigrams; bigrams = 3/doc
    // = 18; "alpha beta" occurs 5 times (doc 4 breaks it); alpha 6,
    // beta 6
    assert(ab.getAs[Long]("n_pair") == 5L)
    assert(ab.getAs[Long]("c_w1") == 6L)
    assert(ab.getAs[Long]("c_w2") == 6L)
    val lift = ab.getAs[Double]("lift")
    assert(lift == (5.0 * 24.0 * 24.0) / (6.0 * 6.0 * 18.0),
      s"lift $lift != hand-computed 2880/648")
    assert(ab.getAs[Double]("pmi") == math.log(lift))
  }

  test("minCount gates candidates and output is lift-descending") {
    val out = queries.TextAnalysis.collocations(docs, minCount = 5L, topN = 10)
      .collect()
    assert(!out.exists(_.getAs[String]("bigram") == "alpha gamma"),
      "below-minCount bigram survived the gate")
    val lifts = out.map(_.getAs[Double]("lift"))
    assert(lifts.sameElements(lifts.sortBy(-(_: Double))), "not lift-descending")
    // lowering minCount admits the rare bigram
    val loose = queries.TextAnalysis.collocations(docs, minCount = 1L, topN = 100)
      .collect()
    assert(loose.exists(_.getAs[String]("bigram") == "alpha gamma"))
  }

  test("topN truncates after ordering") {
    val top1 = queries.TextAnalysis.collocations(docs, minCount = 1L, topN = 1)
      .collect()
    val all = queries.TextAnalysis.collocations(docs, minCount = 1L, topN = 100)
      .collect()
    assert(top1.length == 1)
    assert(top1.head.getAs[String]("bigram") == all.head.getAs[String]("bigram"))
  }
}
