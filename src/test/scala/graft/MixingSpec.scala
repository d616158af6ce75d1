package graft

import graft.queries.{Contamination, Shards}
import org.apache.spark.sql.functions._

class MixingSpec extends SparkSpec {

  // letter-only tokens: digits are separators under words()
  private def tokens(n: Int, tag: String): String =
    (0 until n).map(i => s"$tag${('a' + i).toChar}").mkString(" ")

  test("decontaminate flags exactly the docs sharing an n-gram with eval") {
    import spark.implicits._
    val k = Contamination.NgramK
    val leaked = tokens(k, "leak") // one exact k-gram
    val eval = Seq((100L, s"${tokens(3, "pre")} $leaked ${tokens(3, "post")}"))
      .toDF("doc_id", "text")
    val train = Seq(
      (1L, s"${tokens(12, "clean")}"),          // no overlap
      (2L, s"${tokens(5, "x")} $leaked"),       // contains the eval k-gram
      (3L, tokens(k - 1, "short"))              // too short for any k-gram
    ).toDF("doc_id", "text")
    val got = Contamination.decontaminate(train, eval)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    // doc 1: shingles, no hits; doc 2: >=1 hit; doc 3: zero shingles, clean
    assert(got(1L)._2 == 0L && got(1L)._3 == 0L && got(1L)._1 > 0L)
    assert(got(2L)._2 >= 1L && got(2L)._3 == 1L)
    assert(got(3L) == ((0L, 0L, 0L)))
  }

  test("decontaminate hit count equals the exact distinct-shingle overlap") {
    import spark.implicits._
    val k = Contamination.NgramK
    // train doc = eval doc => every one of its distinct shingles hits
    val text = tokens(k + 4, "w")
    val eval = Seq((100L, text)).toDF("doc_id", "text")
    val train = Seq((1L, text)).toDF("doc_id", "text")
    val r = Contamination.decontaminate(train, eval).head()
    assert(r.getLong(1) == 5L) // k+4 tokens -> 5 distinct k-grams
    assert(r.getLong(2) == 5L)
    assert(r.getDouble(3) == 1.0)
  }

  test("domainMix downsamples only over-represented groups, keeps rates in (0,1]") {
    import spark.implicits._
    // group "big" has ~10x the tokens of each small group
    val docs =
      (1L to 40L).map(i => (i, "big", tokens(20, "b"))) ++
        (41L to 44L).map(i => (i, "s1", tokens(20, "c"))) ++
        (45L to 48L).map(i => (i, "s2", tokens(20, "d")))
    val out = Shards.domainMix(docs.toDF("doc_id", "lang", "text"), "lang")
    val summary = out.groupBy("lang")
      .agg(min("rate").as("rate"), max("rate").as("rate_max"),
        count(lit(1)).as("n"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("kept"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4))).toMap
    // rate is constant within a group
    summary.values.foreach { case (lo, hi, _, _) => assert(lo == hi) }
    // small groups are under target share -> rate capped at 1, all kept
    assert(summary("s1")._1 == 1.0 && summary("s1")._4 == summary("s1")._3)
    assert(summary("s2")._1 == 1.0)
    // the big group is over target -> rate < 1 and some docs dropped
    val (bigRate, _, bigN, bigKept) = summary("big")
    assert(bigRate > 0.0 && bigRate < 1.0)
    assert(bigKept < bigN && bigKept > 0)
    // target share = total/3 tokens; big keeps ~1/3 of its docs
    assert(math.abs(bigRate - (48.0 * 20 / 3) / (40.0 * 20)) < 1e-12)
  }

  test("labelCentroids: exact quantized mean, invariant to partitioning") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Seq(0.5f, -0.25f), 0),
      (2L, Seq(1.0f, 0.75f), 0),
      (3L, Seq(-1.0f, 0.125f), 1)
    ).toDF("vec_id", "embedding", "label")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.queries.Similarity.labelCentroids(df)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val got = run(vecs)
    // values are exact binary fractions: quantization is lossless here
    assert(got((0L, 0L)) == ((2L, 0.75)))   // (0.5 + 1.0)/2
    assert(got((0L, 1L)) == ((2L, 0.25)))   // (-0.25 + 0.75)/2
    assert(got((1L, 0L)) == ((1L, -1.0)))
    assert(got((1L, 1L)) == ((1L, 0.125)))
    // shuffle-order independence: different partitioning, identical bits
    assert(run(vecs.repartition(7)) == got)
  }

  test("domainMix keep decisions are deterministic across runs") {
    import spark.implicits._
    val docs = (1L to 50L).map(i =>
      (i, if (i % 3 == 0) "a" else "b", tokens(10, "t"))).toDF("doc_id", "lang", "text")
    def keptIds = Shards.domainMix(docs, "lang")
      .filter(col("keep")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(keptIds == keptIds)
    assert(keptIds.nonEmpty)
  }

  test("temperature mixing: alpha=1 keeps the natural distribution, alpha interpolates") {
    import spark.implicits._
    // skewed corpus: group a has 4x group b's token mass
    val docs = (1L to 50L).map(i =>
      (i, if (i <= 40) "a" else "b", tokens(10, "t"))).toDF("doc_id", "lang", "text")
    def rates(alpha: Double): Map[String, Double] =
      Shards.domainMixTemperature(docs, "lang", alpha)
        .select("lang", "rate").distinct()
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // alpha = 1: target share == natural share, every rate is 1
    val natural = rates(1.0)
    assert(natural.values.forall(_ == 1.0), s"alpha=1 resampled: $natural")
    // alpha = 0.5: the over-represented group is downsampled, the tail
    // kept whole; sqrt weighting must downsample LESS aggressively than
    // uniform equalization (rate between domainMix's and 1)
    val temp = rates(0.5)
    val uniform = Shards.domainMix(docs, "lang")
      .select("lang", "rate").distinct()
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(temp("b") == 1.0, s"tail group resampled: $temp")
    assert(temp("a") < 1.0 && temp("a") > uniform("a"),
      s"sqrt rate ${temp("a")} not between uniform ${uniform("a")} and 1")
    // alpha = 0: pow(g, 0) = 1 exactly, all weights equal -> the rate
    // formula collapses to domainMix's uniform equalization, bit-equal
    assert(rates(0.0) == uniform, "alpha=0 diverged from uniform domainMix")
  }

  test("shuffleOrder: a seeded permutation, stable across partitionings, seed-sensitive") {
    import spark.implicits._
    val docs = (0L until 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    def order(df: org.apache.spark.sql.DataFrame, seed: Long): Seq[(Long, Long)] =
      Shards.shuffleOrder(df, seed).as[(Long, Long)].collect().toSeq
    val a = order(docs, 42L)
    // a permutation: every position 1..n exactly once
    assert(a.map(_._2).sorted == (1L to 200L), "pos is not a permutation")
    // partitioning must not change the order (the prefix-sum contract)
    assert(order(docs.repartition(13), 42L) == a, "order depends on partitioning")
    // a different seed reshuffles; the same seed reproduces
    assert(order(docs, 43L) != a, "seed does not change the order")
    assert(order(docs, 42L) == a, "same seed not reproducible")
    // not the identity order (the scramble actually shuffles)
    assert(a.count { case (id, pos) => pos == id + 1 } < 20, "order is near-identity")
  }

  test("shuffleOrder rejects the degenerate seed and colliding ids loudly") {
    import spark.implicits._
    val docs = (0L until 10L).map(i => (i, "x")).toDF("doc_id", "text")
    // P-1 would zero the multiplier — excluded from the domain up front
    intercept[IllegalArgumentException] {
      Shards.shuffleOrder(docs, seed = 1000000006L)
    }
    // an id >= 2^32 would silently collide in the packed order key:
    // must raise per-row, not return a nondeterministic order
    val wide = docs.unionByName(Seq((4294967296L, "x")).toDF("doc_id", "text"))
    val e = intercept[Exception] { Shards.shuffleOrder(wide).collect() }
    assert(e.getMessage != null)
  }

  test("curriculumOrder: decile-major positions, shuffled within deciles") {
    import spark.implicits._
    // quality score rises with stopword density: "the" docs land in a
    // higher decile than pure-junk docs
    val docs = ((0L until 20L).map(i => (i, "the cat and the dog have fun")) ++
      (20L until 40L).map(i => (i, "zzzz qqqq xxxx wwww kkkk jjjj"))).toDF("doc_id", "text")
    val out = Shards.curriculumOrder(docs, seed = 1L).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.size == 40)
    val (good, junk) = (0L until 40L).partition(_ < 20L)
    val gd = good.map(out(_)._1).toSet; val jd = junk.map(out(_)._1).toSet
    assert(gd.size == 1 && jd.size == 1 && gd.head > jd.head,
      s"stopword docs must occupy the better decile: $gd vs $jd")
    // decile-major: EVERY good doc precedes every junk doc
    assert(good.map(out(_)._2).max < junk.map(out(_)._2).min,
      "higher-decile docs must come first in curriculum order")
    // positions are a permutation, and the within-decile order is
    // seed-sensitive while the decile blocks stand
    assert(out.values.map(_._2).toSet == (1L to 40L).toSet)
    val out2 = Shards.curriculumOrder(docs, seed = 2L).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(good.map(out2(_)).max < junk.map(out2(_)).min)
    assert(good.exists(i => out2(i) != out(i)._2),
      "a different seed must reshuffle within the decile block")
  }
}
