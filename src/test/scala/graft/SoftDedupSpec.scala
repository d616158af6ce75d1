package graft

import org.apache.spark.sql.functions._

/** D26 [[graft.queries.Dedup.softDedupWeights]]: weight conservation
  * (Σ weight per dup group = 1, Σ weight corpus-wide = distinct
  * contents), agreement with D1's hard decision, and normalization
  * semantics (dup detection is on normalized text). */
class SoftDedupSpec extends SparkSpec {
  import spark.implicits._

  test("weights conserve mass: group sums 1, corpus sums distinct contents") {
    val docs = Seq(
      (0L, "alpha beta"), (1L, "alpha beta"), (2L, "alpha beta"),
      (3L, "gamma"), (4L, "Gamma!"), // normalizes equal to doc 3
      (5L, "unique text")).toDF("doc_id", "text")
    val out = Graft.softDedupWeights(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    assert(out(0L) == ((3L, 1.0 / 3, 1L)))
    assert(out(1L) == ((3L, 1.0 / 3, 0L)))
    assert(out(4L) == ((2L, 0.5, 0L)), "normalized-equal text must group")
    assert(out(5L) == ((1L, 1.0, 1L)))
    val total = out.values.map(_._2).sum
    assert(math.abs(total - 3.0) < 1e-12, s"3 distinct contents, got $total")
    assert(out.values.count(_._3 == 1L) == 3, "one canonical per group")
  }

  test("canonical choice matches D1's survivor (min doc_id)") {
    val docs = Seq((7L, "same"), (3L, "same"), (5L, "same"))
      .toDF("doc_id", "text")
    val hard = Graft.exactDuplicates(docs).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    val soft = Graft.softDedupWeights(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    docs.select("doc_id").as[Long].collect().foreach { id =>
      assert((soft(id) == 1L) == !hard(id), s"doc $id policy disagreement")
    }
  }

  test("all-unique corpus: every weight 1 and every doc canonical") {
    val docs = Tables.documents(spark, sfDir).limit(50)
    val out = Graft.softDedupWeights(
      docs.withColumn("text", concat(col("text"), col("doc_id"))))
    assert(out.filter(col("weight") =!= 1.0 || col("is_canonical") =!= 1L)
      .count() == 0L)
  }
}
