package graft

import graft.ops.ScaleOps
import org.apache.spark.sql.functions._

class ScaleOpsSpec extends SparkSpec {

  test("approxDistinct within rsd of the exact counts") {
    val li = Tables.lineitem(spark, sfDir)
    val approx = ScaleOps.approxDistinct(li, Seq("l_partkey", "l_orderkey"), rsd = 0.05).head
    val exact = li.agg(
      countDistinct(col("l_partkey")), countDistinct(col("l_orderkey"))).head
    for (i <- 0 until 2) {
      val (a, e) = (approx.getLong(i).toDouble, exact.getLong(i).toDouble)
      assert(math.abs(a - e) / e < 0.15, s"col $i: approx $a vs exact $e")
    }
  }

  test("approxPercentiles lands within rank tolerance of exact order stats") {
    val li = Tables.lineitem(spark, sfDir).select(col("l_quantity").cast("double").as("q"))
    val got = ScaleOps.approxPercentiles(li, "q", Nil, Seq(0.5, 0.95)).head
    val exact = li.agg(
      expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY q)"),
      expr("percentile_cont(0.95) WITHIN GROUP (ORDER BY q)")).head
    for (i <- 0 until 2) {
      val (a, e) = (got.getDouble(i), exact.getDouble(i))
      // quantities are 1..50; a rank-accurate sketch stays within a
      // couple of distinct values of the exact percentile
      assert(math.abs(a - e) <= 2.0, s"p$i: approx $a vs exact $e")
    }
  }

  test("saltedJoin returns exactly the plain join's rows under skew") {
    import spark.implicits._
    // 50k rows, 90% on one hot key
    val big = spark.range(50000)
      .select((when(col("id") % 10 < 9, 1L).otherwise(col("id") % 100)).as("k"),
        col("id").as("payload"))
    val small = Seq((1L, "hot"), (7L, "cold"), (42L, "other")).toDF("k", "label")
    val plain = big.join(small, Seq("k"))
    val salted = ScaleOps.saltedJoin(big, small, Seq("k"), buckets = 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("saltedJoin positionalSalt spreads byte-identical duplicate rows, same result") {
    import spark.implicits._
    val big = spark.range(20000).select(lit(1L).as("k"), lit(9L).as("payload"))
    val small = Seq((1L, "hot")).toDF("k", "label")
    val plain = big.join(small, Seq("k"))
    val salted = ScaleOps.saltedJoin(big, small, Seq("k"), buckets = 8,
      positionalSalt = true)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
  }

  test("asOfJoin picks the latest state at or before each fact time") {
    import spark.implicits._
    val states = Seq(
      ("a", 10L, 1L, 100L), ("a", 20L, 2L, 200L), ("a", 20L, 3L, 300L), // tie on t: version 3 wins
      ("b", 15L, 1L, 999L)
    ).toDF("k", "t", "version", "value")
    val facts = Seq(
      ("a", 5L),   // before any state -> nulls
      ("a", 10L),  // exactly the first state
      ("a", 19L),  // still the first
      ("a", 20L),  // tie resolves to the larger version
      ("a", 50L),  // latest
      ("b", 15L),
      ("c", 7L)    // key with no states at all -> nulls
    ).toDF("k", "ft")
    val got = graft.ops.AsOfJoin
      .asOfJoin(facts, states, Seq("k"), "ft", "t", Seq("version", "value"))
      .select("k", "ft", "version", "value")
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(got == Set(
      ("a", 5L, -1L, -1L),
      ("a", 10L, 1L, 100L),
      ("a", 19L, 1L, 100L),
      ("a", 20L, 3L, 300L),
      ("a", 50L, 3L, 300L),
      ("b", 15L, 1L, 999L),
      ("c", 7L, -1L, -1L)))
  }

  test("asOfJoin contract edges: null state times dropped, misuse rejected") {
    import spark.implicits._
    val states = Seq((1L, Some(10L), 1L), (1L, None, 99L)).toDF("k", "t", "version")
    val facts = Seq((1L, 20L)).toDF("k", "ft")
    // the null-time state can never match — both variants must agree
    for (variant <- Seq(
        graft.ops.AsOfJoin.asOfJoin _, graft.ops.AsOfJoin.asOfJoinBig _)) {
      val got = variant(facts, states, Seq("k"), "ft", "t", Seq("version"))
        .select("version").collect().map(_.getLong(0)).toSeq
      assert(got == Seq(1L))
    }
    // non-BIGINT time columns are rejected, not silently truncated
    val tsFacts = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("k", "ft")
    intercept[IllegalArgumentException] {
      graft.ops.AsOfJoin.asOfJoin(tsFacts, states, Seq("k"), "ft", "t", Seq("version"))
    }
    // payload colliding with a fact column is rejected, not overwritten
    val collidingFacts = Seq((1L, 20L, 7L)).toDF("k", "ft", "version")
    intercept[IllegalArgumentException] {
      graft.ops.AsOfJoin.asOfJoinBig(collidingFacts, states, Seq("k"), "ft", "t", Seq("version"))
    }
    // a fact column named like an internal scratch column is rejected,
    // not silently overwritten and dropped
    val reservedFacts = Seq((1L, 20L, 5L)).toDF("k", "ft", "__idx")
    intercept[IllegalArgumentException] {
      graft.ops.AsOfJoin.asOfJoin(reservedFacts, states, Seq("k"), "ft", "t", Seq("version"))
    }
  }

  test("asOfJoin == interval theta-join formulation on a generated history") {
    import spark.implicits._
    val states = spark.range(200)
      .select(( col("id") % 4).as("k"), (col("id") * 7 % 1000).as("t"),
        col("id").as("version"), (col("id") * 13 % 97).as("value"))
    val facts = spark.range(5000)
      .select((col("id") % 5).as("k"), (col("id") * 31 % 1100).as("ft"))
    val got = graft.ops.AsOfJoin
      .asOfJoin(facts, states, Seq("k"), "ft", "t", Seq("version", "value"))
    // oracle: max (t, version) per fact via window over the theta-join
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k", "ft", "__rid").orderBy(col("t").desc, col("version").desc)
    val want = facts.withColumn("__rid", monotonically_increasing_id())
      .join(states.withColumnRenamed("k", "sk"),
        col("sk") === col("k") && col("t") <= col("ft"), "left")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("k"), col("ft"), col("version"), col("value"))
    val g = got.select("k", "ft", "version", "value")
    assert(g.exceptAll(want).count() == 0 && want.exceptAll(g).count() == 0)
    // the big-states shuffle variant must agree with the broadcast one
    val big = graft.ops.AsOfJoin
      .asOfJoinBig(facts, states, Seq("k"), "ft", "t", Seq("version", "value"))
      .select("k", "ft", "version", "value")
    assert(big.exceptAll(g).count() == 0 && g.exceptAll(big).count() == 0)
  }

  test("twoPhaseAgg merges partials to the exact grouped result") {
    import spark.implicits._
    val df = spark.range(20000)
      .select((col("id") % 3).as("k"), (col("id") % 7).as("v"))
    val got = ScaleOps.twoPhaseAgg(df, Seq("k"),
      partial = Seq(sum(col("v")).as("s"), count(lit(1)).as("c")),
      merge = Seq(sum(col("s")).as("total"), sum(col("c")).cast("long").as("n")),
      buckets = 8)
    val want = df.groupBy("k").agg(sum(col("v")).as("total"), count(lit(1)).as("n"))
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }
}
