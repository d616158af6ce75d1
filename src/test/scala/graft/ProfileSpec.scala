package graft

import graft.queries.Profile
import org.apache.spark.sql.functions._

/** Data profiling & validation (SURVEY.md §2 I1/I2) semantics. */
class ProfileSpec extends SparkSpec {

  import spark.implicits._

  test("profile counts nulls, distincts and ranges on a known frame") {
    val df = Seq(
      (Some(1L), Some("ab")), (Some(2L), None),
      (Some(2L), Some("xyz")), (None, Some("ab")))
      .toDF("k", "s")
    val got = Profile.profile(df, numericCols = Seq("k"), stringCols = Seq("s"))
      .as[(String, String, Double)].collect()
      .map { case (c, m, v) => (c, m) -> v }.toMap
    assert(got(("k", "n")) == 3.0 && got(("k", "n_null")) == 1.0)
    assert(got(("k", "n_distinct")) == 2.0)
    assert(got(("k", "min")) == 1.0 && got(("k", "max")) == 2.0)
    assert(got(("s", "n_distinct")) == 2.0)
    assert(got(("s", "min_len")) == 2.0 && got(("s", "max_len")) == 3.0)
  }

  test("approx-distinct path stays within HLL tolerance of exact") {
    val docs = Tables.documents(spark, sfDir)
    val exact = Profile.profile(docs, Seq("doc_id"), Seq("source"))
      .filter($"metric" === "n_distinct")
      .as[(String, String, Double)].collect().map(r => r._1 -> r._3).toMap
    val approx = Profile.profile(docs, Seq("doc_id"), Seq("source"),
      exactDistinct = false)
      .filter($"metric" === "n_distinct")
      .as[(String, String, Double)].collect().map(r => r._1 -> r._3).toMap
    exact.foreach { case (c, v) =>
      assert(math.abs(approx(c) - v) <= math.max(2.0, v * 0.1), s"col $c")
    }
  }

  test("all-NULL column is caught by completeness, empty input reports zeros") {
    val li = Tables.lineitem(spark, sfDir)
    // corrupt drop: discount decodes as all-NULL — the range check sees
    // no non-null violators, the completeness check must fail instead
    val corrupt = li.withColumn("l_discount", lit(null).cast("double"))
    val checks = Profile.lineitemChecks(corrupt, Tables.orders(spark, sfDir))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(checks("discount_in_0_1")._2 == 1L, "range check counts non-null only")
    assert(checks("discount_not_null") == ((li.count(), 0L)), "completeness flags it")
    // empty input: zeros everywhere, no NULL violations
    val empty = Profile.lineitemChecks(li.limit(0), Tables.orders(spark, sfDir))
      .as[(String, Long, Long)].collect()
    assert(empty.nonEmpty && empty.forall(r => r._2 == 0L && r._3 == 1L))
  }

  test("quality checks flag planted violations exactly") {
    val li = Tables.lineitem(spark, sfDir)
    val bad = li.limit(2)
      .withColumn("l_quantity", lit(999.0)) // range violation x2
      .withColumn("l_orderkey", lit(-1L))   // orphan key x2
    val checks = Profile.lineitemChecks(li.unionByName(bad), Tables.orders(spark, sfDir))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(checks("quantity_in_1_50") == ((2L, 0L)))
    assert(checks("orderkey_in_orders") == ((2L, 0L)))
    assert(checks("orderkey_not_null") == ((0L, 1L)))
    // on the raw corpus: every value/domain/referential check passes,
    // and the key-uniqueness violation count equals the independently
    // computed duplicate mass (the synthetic lineitem actually HAS
    // duplicate (orderkey, linenumber) pairs — the check must see them)
    val clean = Profile.lineitemChecks(li, Tables.orders(spark, sfDir))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val dupMass = li.count() -
      li.select("l_orderkey", "l_linenumber").distinct().count()
    assert(clean("orderkey_linenumber_unique")._1 == dupMass)
    (clean - "orderkey_linenumber_unique").foreach { case (name, (_, passed)) =>
      assert(passed == 1L, s"check $name should pass on the raw corpus")
    }
  }

  test("histogram: exact buckets, max-clamp, null exclusion, constant column") {
    import spark.implicits._
    def buckets(rows: Array[org.apache.spark.sql.Row]): Map[Long, Long] =
      rows.map(r => r.getLong(0) -> r.getLong(3)).toMap
    // values 0..9 over [0, 9]: bucket width 0.9, value v -> floor(v/0.9)
    // except v=9 which clamps into bucket 9; one NULL must vanish from
    // the finite buckets and surface as the bucket=-1 tally
    val df = ((0 to 9).map(v => Some(v.toDouble)) :+ None).toDF("x")
    val h = buckets(Profile.histogram(df, "x", buckets = 10).collect())
    assert(h.filter(_._1 >= 0).values.sum == 10L, "null row leaked into the histogram")
    assert(h(-1L) == 1L && h(-2L) == 0L && h(-3L) == 0L,
      "dirty tallies must be explicit rows")
    assert(h(9L) == 1L, "max value must clamp into the last bucket")
    assert(h.keys.forall(b => b >= -3 && b <= 9))
    // constant column: everything in bucket 0, bounds degenerate
    val const = Seq(5.0, 5.0, 5.0).toDF("x")
    val hc = Profile.histogram(const, "x").collect()
    val hcFin = hc.filter(_.getLong(0) >= 0)
    assert(hcFin.length == 1 && hcFin.head.getLong(0) == 0L && hcFin.head.getLong(3) == 3L)
    assert(hcFin.head.getDouble(1) == 5.0 && hcFin.head.getDouble(2) == 5.0)
    // NaN and ±Inf must be excluded like NULL — a NaN poisons max()
    // (NaN sorts greatest in Spark) and ONE Inf row makes hi infinite,
    // either way collapsing every finite row into bucket 0 — and each
    // must be tallied in its own dirty row with NULL bounds
    val dirty = Seq(0.0, 4.5, 9.0, Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity).toDF("x")
    val rows = Profile.histogram(dirty, "x").collect()
    val hd = buckets(rows)
    assert(hd.filter(_._1 >= 0).values.sum == 3L, "NaN/Inf leaked into the histogram")
    assert(hd.filter(_._1 >= 0).keySet == Set(0L, 5L, 9L),
      s"NaN/Inf poisoned the extrema: buckets ${hd.keys.toSeq.sorted.mkString(",")}")
    assert(hd(-1L) == 0L && hd(-2L) == 1L && hd(-3L) == 2L,
      "NULL/NaN/Inf tallies must land in buckets -1/-2/-3")
    assert(rows.filter(_.getLong(0) < 0).forall(r => r.isNullAt(1) && r.isNullAt(2)),
      "dirty rows must carry NULL bounds")
  }

  test("chisq: balanced grid is exactly 0, perfect association is n*(k-1)") {
    import spark.implicits._
    // perfectly balanced 2x2 -> o == e for every cell -> chi2 exactly 0
    val bal = (Seq.fill(5)(("x", "u")) ++ Seq.fill(5)(("x", "v")) ++
      Seq.fill(5)(("y", "u")) ++ Seq.fill(5)(("y", "v"))).toDF("a", "b")
    val b = Profile.chisq(bal, "a", "b").collect().head
    assert((b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3)) ==
      ((20L, 2L, 2L, 1L)))
    assert(b.getDouble(4) == 0.0, s"balanced grid chi2 ${b.getDouble(4)}")
    // perfect association (a determines b): chi2 = n*(k-1), and the
    // EMPTY cells (x,v)/(y,u) contribute half that mass — an
    // observed-only sum would report 10, not 20
    val dep = (Seq.fill(10)(("x", "u")) ++ Seq.fill(10)(("y", "v")))
      .toDF("a", "b")
    val d = Profile.chisq(dep, "a", "b").collect().head
    assert(d.getDouble(4) == 20.0, s"perfect-association chi2 ${d.getDouble(4)}")
    assert(d.getLong(3) == 1L)
    // NULL categories are excluded entirely (a NULL group would carry
    // marginal mass the equality-joined grid can never match)
    val withNulls = (Seq.fill(10)((Some("x"), Some("u"))) ++
      Seq.fill(10)((Some("y"), Some("v"))) ++
      Seq.fill(7)((None: Option[String], Some("u"))) ++
      Seq.fill(3)((Some("x"), None: Option[String]))).toDF("a", "b")
    val n = Profile.chisq(withNulls, "a", "b").collect().head
    assert((n.getLong(0), n.getLong(1), n.getLong(2), n.getDouble(4)) ==
      ((20L, 2L, 2L, 20.0)), s"nulls must not inflate the statistic: $n")
  }

  test("psi: identical snapshots are exactly 0; planted drift crosses the bands") {
    val ref = (1 to 200).map(i => (i.toDouble, if (i % 2 == 0) "a" else "b"))
      .toDF("x", "cat")
    // identical snapshots: every bin has pr == pc, ln(1) == 0 exactly
    val same = Profile.psi(ref, ref, Seq("x"), Seq("cat"))
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(same == Map("x" -> 0.0, "cat" -> 0.0), same.toString)
    // planted categorical swap (a/b 50:50 -> 90:10) and numeric shift
    // (uniform 1..200 -> 141..200 top-tercile mass): both must cross
    // the conventional 0.25 "act" band
    val drifted = (1 to 200).map(i =>
      (141.0 + (i % 60), if (i % 10 == 0) "b" else "a")).toDF("x", "cat")
    val d = Profile.psi(ref, drifted, Seq("x"), Seq("cat"))
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(d("x") > 0.25 && d("cat") > 0.25, d.toString)
  }

  test("psi: out-of-range values clamp into edge bins; nulls excluded") {
    val ref = (1 to 100).map(i => (i.toDouble, "k")).toDF("x", "cat")
    // current snapshot entirely OUTSIDE the reference range: everything
    // lands in the edge bins (bucket 0 below, bucket 9 above) — the
    // mass a drift alarm must see, not drop
    val out = (Seq.fill(30)(-50.0) ++ Seq.fill(70)(500.0)).map((_, "k"))
      .toDF("x", "cat")
    val r = Profile.psi(ref, out, Seq("x"), Seq("cat"), buckets = 10)
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("x").getLong(2) == 100L, s"clamped rows lost: ${r("x")}")
    assert(r("x").getDouble(4) > 0.25, s"edge-bin drift missed: ${r("x")}")
    // nulls and NaN excluded from n on both sides, both column kinds
    val withNulls = (Seq((Some(1.0), Option("k")),
      (None: Option[Double], Option("k")),
      (Some(Double.NaN), None: Option[String])) ++
      (1 to 50).map(i => (Some(i.toDouble), Option("k")))).toDF("x", "cat")
    val n = Profile.psi(withNulls, withNulls, Seq("x"), Seq("cat"))
      .collect().map(x => x.getString(0) -> x).toMap
    assert(n("x").getLong(1) == 51L && n("x").getLong(2) == 51L, n("x").toString)
    assert(n("cat").getLong(1) == 52L && n("cat").getDouble(4) == 0.0,
      n("cat").toString)
    // a vacuous numeric reference (no finite values) fails loudly —
    // a silent (0,0)-bounds fallback would bin arbitrary current
    // values and drift from the oracle
    val vac = Seq((Option.empty[Double], "k"), (Some(Double.NaN), "k"))
      .toDF("x", "cat")
    val ok = (1 to 5).map(i => (Some(i.toDouble), "k")).toDF("x", "cat")
    val e = intercept[IllegalArgumentException] {
      Profile.psi(vac, ok, Seq("x"), Seq("cat"))
    }
    assert(e.getMessage.contains("vacuous"), e.getMessage)
  }
}
