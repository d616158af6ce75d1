package graft

import graft.queries.DocEmbed
import org.apache.spark.sql.functions._

/** E9 [[graft.queries.DocEmbed]]: the hashing-trick text→vector
  * bridge — hand-checked sparse components, the dense contract, and
  * the end-to-end hop into the E-family's cosine machinery. */
class DocEmbedSpec extends SparkSpec {
  import spark.implicits._

  test("identical texts embed identically; disjoint texts share no hot dims by construction") {
    val docs = Seq(
      (1L, "alpha beta gamma alpha"),
      (2L, "alpha beta gamma alpha"), // identical content
      (3L, "delta epsilon zeta"))
      .toDF("doc_id", "text")
    val out = DocEmbed.docEmbed(docs, dims = 16).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(r => (r.getLong(1), r.getLong(2))).toSet }
    assert(out(1L) == out(2L), "same text must give the same sparse vector")
    assert(out(1L).nonEmpty)
    // each word occurrence contributes exactly ±1: total mass bound
    assert(out(1L).toSeq.map(_._2.abs).sum <= 4)
  }

  test("densifier: every doc appears, wordless docs as zero vectors, dims fixed") {
    val docs = Seq((1L, "some words here"), (2L, ""), (3L, "1234 !!"))
      .toDF("doc_id", "text")
    val v = DocEmbed.docEmbedVectors(docs, dims = 8).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(v.keySet == Set(1L, 2L, 3L))
    assert(v.values.forall(_.size == 8))
    assert(v(2L).forall(_ == 0f) && v(3L).forall(_ == 0f))
    assert(v(1L).exists(_ != 0f))
  }

  test("the bridge feeds the E-family: identical docs pair at cosine 1.0") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different content about winter mountain weather"))
      .toDF("doc_id", "text")
    val pairs = Graft.embeddingDupPairs(
        DocEmbed.docEmbedVectors(docs, dims = 32), minCosine = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), pairs)
  }

  test("sparse form is partitioning-invariant and matches the dense form") {
    val docs = Tables.documents(spark, sfDir)
    val a = DocEmbed.docEmbed(docs, 16).collect().toSeq
    val b = DocEmbed.docEmbed(docs.repartition(9), 16).collect().toSeq
    assert(a == b)
    // densified components equal the sparse map
    val dense = DocEmbed.docEmbedVectors(docs, 16).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val sparse = a.groupBy(_.getLong(0)).map { case (id, rs) =>
      id -> rs.map(r => r.getLong(1).toInt -> r.getLong(2).toFloat).toMap
    }
    dense.foreach { case (id, vec) =>
      val m = sparse.getOrElse(id, Map.empty)
      vec.zipWithIndex.foreach { case (x, i) =>
        assert(x == m.getOrElse(i, 0f), s"doc $id dim $i")
      }
    }
  }
}
