package graft

import graft.queries.Profile
import org.apache.spark.sql.functions.element_at

/** I6 [[graft.queries.Profile.approxQuantiles]]: the GK sketch at
  * exhaustive accuracy equals exact order statistics; at working
  * accuracy its rank error honors the n/accuracy bound. */
class ApproxQuantilesSpec extends SparkSpec {
  import spark.implicits._

  test("exhaustive accuracy == exact percentile_disc, group for group") {
    val c = Tables.customer(spark, sfDir)
    c.createOrReplaceTempView("aq_customer")
    val exact = spark.sql("""SELECT c_mktsegment,
        percentile_disc(0.25) WITHIN GROUP (ORDER BY c_acctbal) AS p25,
        percentile_disc(0.5)  WITHIN GROUP (ORDER BY c_acctbal) AS p50,
        percentile_disc(0.95) WITHIN GROUP (ORDER BY c_acctbal) AS p95
      FROM aq_customer GROUP BY c_mktsegment ORDER BY c_mktsegment""")
      .collect().toSeq
    val got = Profile.approxQuantiles(c, "c_acctbal", "c_mktsegment",
        Seq(0.25, 0.5, 0.95), accuracy = 10000000)
      .select($"c_mktsegment",
        element_at($"quantiles", 1), element_at($"quantiles", 2),
        element_at($"quantiles", 3))
      .collect().toSeq
    assert(got == exact)
  }

  test("working accuracy honors the n/accuracy rank-error bound") {
    // one group of 10_000 distinct values 1..10_000: the true rank of
    // any returned value is the value itself, so the bound is directly
    // checkable. accuracy 100 -> rank error <= n/accuracy = 100.
    val n = 10000
    val df = (1 to n).map(v => ("g", v.toDouble)).toDF("grp", "v")
    val probs = Seq(0.1, 0.5, 0.9)
    val qs = Profile.approxQuantiles(df, "v", "grp", probs, accuracy = 100)
      .select($"quantiles").head().getSeq[Double](0)
    probs.zip(qs).foreach { case (p, q) =>
      val target = p * n
      assert(math.abs(q - target) <= n / 100 + 1,
        s"p=$p returned $q, target rank $target, bound ${n / 100}")
    }
  }

  test("null values are excluded from both n and the quantiles") {
    val df = Seq(("g", Some(1.0)), ("g", Some(2.0)), ("g", Some(3.0)),
      ("g", None)).toDF("grp", "v")
    val row = Profile.approxQuantiles(df, "v", "grp", Seq(0.5), 10000).head()
    assert(row.getLong(1) == 3L)
    assert(row.getSeq[Double](2) == Seq(2.0))
  }
}
