package graft

import graft.queries.FuzzyJoin
import org.apache.spark.sql.functions._

/** D22 [[FuzzyJoin.fuzzyJoin]]: FastSS deletion-neighborhood blocking
  * must return EXACTLY the naive all-pairs Levenshtein result — the
  * losslessness differential the oracle row also proves — plus edge
  * cases (threshold boundary, empty/short strings, maxDist 0/1). */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  test("blocked join equals brute force on a mixed corpus (k=2)") {
    val dirty = Seq("helo", "kitten", "smal ring", "xy", "", "red bot")
      .toDF("n")
    val master = Seq("hello", "sitting", "small ring", "x", "red bolt", "zzz")
      .toDF("m")
    val blocked = FuzzyJoin.fuzzyJoin(dirty, "n", master, "m", 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val brute = dirty.distinct().crossJoin(master.distinct())
      .filter(levenshtein(col("n"), col("m")) <= 2)
      .select(col("n"), col("m"), levenshtein(col("n"), col("m")).cast("long"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(blocked == brute, s"blocked $blocked vs brute $brute")
    // sanity: the intended matches are present, the dist-3 pair is not
    assert(blocked.contains(("helo", "hello", 1L)))
    assert(blocked.contains(("smal ring", "small ring", 1L)))
    assert(!blocked.exists(p => p._1 == "kitten" && p._2 == "sitting"),
      "kitten/sitting is dist 3 — must not match at k=2")
  }

  test("maxDist 0 and 1 restrict correctly; 3 is rejected") {
    val dirty = Seq("abc", "abd", "ab").toDF("n")
    val master = Seq("abc").toDF("m")
    val k0 = FuzzyJoin.fuzzyJoin(dirty, "n", master, "m", 0)
      .collect().map(_.getString(0)).toSet
    assert(k0 == Set("abc"))
    val k1 = FuzzyJoin.fuzzyJoin(dirty, "n", master, "m", 1)
      .collect().map(_.getString(0)).toSet
    assert(k1 == Set("abc", "abd", "ab"))
    intercept[IllegalArgumentException](
      FuzzyJoin.fuzzyJoin(dirty, "n", master, "m", 3))
  }

  test("duplicate and null inputs collapse; output is one row per pair") {
    val dirty = Seq(Some("aa"), Some("aa"), None).toDF("n")
    val master = Seq("aa", "aa", "ab").toDF("m")
    val out = FuzzyJoin.fuzzyJoin(dirty, "n", master, "m", 1).collect()
    assert(out.length == 2, out.toSeq)
    assert(out.map(r => (r.getString(1), r.getLong(2))).toSet ==
      Set(("aa", 0L), ("ab", 1L)))
  }
}
