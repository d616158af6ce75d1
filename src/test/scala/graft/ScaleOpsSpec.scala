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
