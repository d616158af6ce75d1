package graft

import org.apache.spark.sql.functions._

/** DSIR importance-resampling contract (H9): docs whose hashed-n-gram
  * distribution matches the target sample must outrank docs that
  * don't, the selection flag must mark exactly the top-k, and the
  * whole pipeline must be deterministic (integer fixed-point weights —
  * no float aggregation anywhere). */
class SelectionSpec extends SparkSpec {

  import spark.implicits._

  // target vocab {alpha..epsilon}; off-domain vocab {zulu..xray}.
  // Raw docs: 10 pure in-domain, 10 mixed, 10 pure off-domain — all
  // LENGTH-MATCHED at 20 tokens: the DSIR weight is a log-likelihood
  // ratio, so |w| grows with doc length and the in > mixed > off
  // ordering is only guaranteed among same-length docs.
  private lazy val docs = {
    val tVocab = Seq("alpha", "beta", "gamma", "delta", "epsilon")
    val zVocab = Seq("zulu", "yankee", "xray", "whiskey", "victor")
    def run(vocab: Seq[String], salt: Int, n: Int): String =
      (0 until n).map(i => vocab((i * 7 + salt) % vocab.size)).mkString(" ")
    def doc(vocab: Seq[String], salt: Int): String = run(vocab, salt, 20)
    val target = (0 until 5).map(i => (100L + i, doc(tVocab, i), "tgt"))
    val inDom = (0 until 10).map(i => (200L + i, doc(tVocab, i + 1), "raw"))
    val mixed = (0 until 10).map(i =>
      (300L + i, run(tVocab, i, 10) + " " + run(zVocab, i, 10), "raw"))
    val offDom = (0 until 10).map(i => (400L + i, doc(zVocab, i), "raw"))
    (target ++ inDom ++ mixed ++ offDom).toDF("doc_id", "text", "source")
  }

  test("in-domain raw docs outrank mixed outrank off-domain") {
    val w = Graft.dsirWeights(docs, col("source") === "tgt", keep = 10)
      .select(col("doc_id"), col("weight")).as[(Long, Double)].collect().toMap
    val inDom = (200 until 210).map(i => w(i.toLong))
    val mixed = (300 until 310).map(i => w(i.toLong))
    val offDom = (400 until 410).map(i => w(i.toLong))
    assert(inDom.min > mixed.max,
      s"in-domain min ${inDom.min} not above mixed max ${mixed.max}")
    assert(mixed.min > offDom.max,
      s"mixed min ${mixed.min} not above off-domain max ${offDom.max}")
  }

  test("selected flags exactly the top-k by (weight desc, doc_id)") {
    val out = Graft.dsirWeights(docs, col("source") === "tgt", keep = 10)
      .select(col("doc_id"), col("weight"), col("selected"))
      .as[(Long, Double, Long)].collect()
    assert(out.count(_._3 == 1L) == 10)
    val byRank = out.sortBy { case (id, w, _) => (-w, id) }
    assert(byRank.take(10).forall(_._3 == 1L) && byRank.drop(10).forall(_._3 == 0L),
      "selected flag does not match the top-10 by (weight desc, doc_id)")
    // the 10 pure in-domain docs are exactly the selection here
    assert(out.filter(_._3 == 1L).map(_._1).sorted.toSeq == (200L until 210L))
  }

  test("dsirSample returns the selected docs themselves") {
    val sample = Graft.dsirSample(docs, col("source") === "tgt", keep = 10)
    assert(sample.select("doc_id").as[Long].collect().sorted.toSeq ==
      (200L until 210L))
    assert(sample.columns.toSeq == docs.columns.toSeq)
  }

  test("deterministic across runs and partitionings") {
    val a = Graft.dsirWeights(docs, col("source") === "tgt").collect()
    val b = Graft.dsirWeights(docs.repartition(7), col("source") === "tgt").collect()
    assert(a.sameElements(b), "weights differ across partitionings")
  }

  test("n_feats counts unigrams + bigrams; target and featureless docs excluded") {
    val out = Graft.dsirWeights(docs, col("source") === "tgt")
    // 20-token docs: 20 unigrams + 19 bigrams
    val nf = out.select(col("doc_id"), col("n_feats")).as[(Long, Long)]
      .collect().toMap
    assert(nf(200L) == 39L && nf(300L) == 39L && nf(400L) == 39L)
    assert(!nf.contains(100L), "target doc leaked into the scored output")
    val withEmpty = docs.unionByName(Seq((500L, "", "raw")).toDF("doc_id", "text", "source"))
    assert(!Graft.dsirWeights(withEmpty, col("source") === "tgt")
      .select("doc_id").as[Long].collect().contains(500L),
      "featureless doc should drop out rather than score 0")
  }

  test("NULL target predicate coalesces to raw instead of vanishing") {
    val withNull = docs.unionByName(
      Seq((600L, "alpha beta gamma delta", null: String)).toDF("doc_id", "text", "source"))
    val ids = Graft.dsirWeights(withNull, col("source") === "tgt")
      .select("doc_id").as[Long].collect()
    assert(ids.contains(600L), "null-source doc dropped from the raw cohort")
  }
}
