package graft

import graft.queries.BigramLm

/** C23 [[BigramLm.bigramLm]]: add-one-smoothed bigram cross-entropy on
  * planted corpora — hand-checked probabilities, fluent-vs-garbage
  * ordering, sub-2-token drops, and tercile bucket assignment. */
class BigramLmSpec extends SparkSpec {
  import spark.implicits._

  test("add-one smoothing matches the hand computation on a two-doc corpus") {
    // corpus: "a b" and "a c". c(a,b)=c(a,c)=1, c(a)=2, V={a,b,c}=3
    // p(b|a) = (1+1)/(2+3) = 0.4 -> xent(doc1) = -ln(0.4)
    val out = BigramLm.bigramLm(
      Seq((1L, "a b"), (2L, "a c")).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.size == 2)
    val expect = -math.log(0.4)
    assert(math.abs(out(1L).getDouble(2) - expect) < 1e-5,
      s"xent ${out(1L).getDouble(2)} vs $expect (2^-20 quantized)")
    assert(out(1L).getLong(1) == 1L, "one bigram")
  }

  test("fluent repeated bigrams score lower than rare garbage; short docs drop") {
    val docs = Seq(
      (1L, "the cat sat and the cat sat and the cat sat"),
      (2L, "the cat sat and the cat sat on the mat"),
      (3L, "zq xv bn qk wj zq pf"),   // bigrams the model barely saw
      (4L, "single"),                  // 1 token -> no bigrams -> dropped
      (5L, "")).toDF("doc_id", "text")
    val out = BigramLm.bigramLm(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 2L, 3L), s"short docs dropped: ${out.keySet}")
    assert(out(1L).getDouble(2) < out(3L).getDouble(2),
      "repeated fluent text must out-score garbage")
    assert(out(1L).getString(3) == "head" && out(3L).getString(3) == "tail",
      s"buckets: ${out.values.map(r => r.getLong(0) -> r.getString(3))}")
  }
}
