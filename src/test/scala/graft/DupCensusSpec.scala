package graft

/** D19 [[graft.queries.DupCensus.dupCensus]] on hand-built corpora:
  * exact census rows, the mass-conservation invariants against the raw
  * shingle frame, and partitioning invariance. */
class DupCensusSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  private def census(df: org.apache.spark.sql.DataFrame, k: Int) =
    Graft.dupCensus(df, k).collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("exact census on a planted corpus") {
    val docs = Seq(
      (1L, "x y z"),        // grams: "x y", "y z"
      (2L, "x y q"),        // grams: "x y", "y q"
      (3L, "x y x y"))      // grams: "x y" (2x), "y x"
      .toDF("doc_id", "text")
    // "x y": df=3, occ=4; "y z","y q","y x": df=1 occ=1 each
    assert(census(docs, 2) == Map(1L -> (3L, 3L), 3L -> (1L, 4L)))
  }

  test("mass conservation: census sums equal the raw shingle frame") {
    val docs = Tables.documents(spark, sfDir)
    val out = Graft.dupCensus(docs, 3)
      .agg(sum(col("n_grams")), sum(col("n_occurrences"))).head()
    val toks = graft.functions.TextFunctions.words(col("text"))
    val raw = docs.select(
      explode(graft.functions.TextFunctions.shingles(toks, 3)).as("s"))
    assert(out.getLong(1) == raw.count(), "total occurrences")
    assert(out.getLong(0) == raw.distinct().count(), "distinct grams")
  }

  test("docs shorter than k contribute nothing; census is partitioning-invariant") {
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "c"), (4L, ""))
      .toDF("doc_id", "text")
    assert(census(docs, 3) == Map.empty)
    assert(census(docs, 2) == Map(2L -> (1L, 2L)))
    assert(census(docs.repartition(5), 2) == Map(2L -> (1L, 2L)))
  }
}
