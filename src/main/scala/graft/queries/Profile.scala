package graft.queries

import graft.{Exact, Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data profiling & validation (SURVEY.md §2 I1/I2) — the Deequ-style
  * quality layer a pipeline runs before trusting 100 TB of input:
  * per-column statistics (completeness, distinctness, ranges, means)
  * and declarative constraint checks (ranges, domains, key uniqueness,
  * referential integrity) with violation counts.
  *
  * Scale shape (I1): ONE global aggregation computes every metric for
  * every profiled column in a single scan (map-side combinable; the
  * result is one row, exploded to long format driver-side-free). The
  * exact `count_distinct` metrics force an Expand of the input — the
  * right call for the oracle-checked row; at true corpus scale pass
  * `exactDistinct = false` to use HLL `approx_count_distinct`, which
  * keeps the scan single-pass with bounded sketches. (I2): each
  * row-level check is a conditional sum in one shared aggregation;
  * the key-uniqueness and referential checks are the only ones that
  * shuffle, on the key columns they verify.
  */
object Profile {

  private def entry(colName: String, metric: String, value: Column): Column =
    struct(lit(colName).as("col_name"), lit(metric).as("metric"),
      value.cast("double").as("value"))

  /** Long-format profile (col_name, metric, value) of the given
    * numeric / string / timestamp columns. Metrics: n (non-null),
    * n_null, n_distinct, and per kind min/max/mean (numeric),
    * min_len/max_len/avg_len (string), min/max epoch millis
    * (timestamp). */
  def profile(
      df: DataFrame,
      numericCols: Seq[String],
      stringCols: Seq[String] = Nil,
      tsCols: Seq[String] = Nil,
      exactDistinct: Boolean = true): DataFrame = {
    def nd(c: String): Column =
      if (exactDistinct) count_distinct(col(c)) else approx_count_distinct(c)
    def common(c: String): Seq[Column] = Seq(
      entry(c, "n", count(col(c))),
      entry(c, "n_null", count(lit(1)) - count(col(c))),
      entry(c, "n_distinct", nd(c)))
    // timezone-free epoch (TPC-H timestamps read as TIMESTAMP_NTZ)
    def epochMs(c: String): Column = Exact.epochMillisNtz(c)
    val entries: Seq[Column] =
      numericCols.flatMap(c => common(c) ++ Seq(
        entry(c, "min", min(col(c))),
        entry(c, "max", max(col(c))),
        entry(c, "mean", Exact.davg(col(c))))) ++
      stringCols.flatMap(c => common(c) ++ Seq(
        entry(c, "min_len", min(length(col(c)))),
        entry(c, "max_len", max(length(col(c)))),
        entry(c, "avg_len", Exact.davg(length(col(c)))))) ++
      tsCols.flatMap(c => common(c) ++ Seq(
        entry(c, "min_epoch_ms", min(epochMs(c))),
        entry(c, "max_epoch_ms", max(epochMs(c)))))
    df.agg(array(entries: _*).as("e"))
      .select(explode(col("e")).as("e"))
      .select(col("e.col_name"), col("e.metric"), col("e.value"))
      .orderBy("col_name", "metric")
  }

  val qProfile: Q = Q(
    "q_profile",
    (s, d) => profile(Tables.orders(s, d),
      numericCols = Seq("o_orderkey", "o_custkey", "o_totalprice"),
      stringCols = Seq("o_orderstatus", "o_orderpriority"),
      tsCols = Seq("o_orderdate")),
    Some {
      def common(c: String): Seq[(String, String, String)] = Seq(
        (c, "n", s"COUNT($c)::DOUBLE"),
        (c, "n_null", s"(COUNT(*) - COUNT($c))::DOUBLE"),
        (c, "n_distinct", s"COUNT(DISTINCT $c)::DOUBLE"))
      val rows: Seq[(String, String, String)] =
        Seq("o_orderkey", "o_custkey", "o_totalprice").flatMap(c => common(c) ++ Seq(
          (c, "min", s"MIN($c)::DOUBLE"),
          (c, "max", s"MAX($c)::DOUBLE"),
          (c, "mean", Exact.sqlDavg(c)))) ++
        Seq("o_orderstatus", "o_orderpriority").flatMap(c => common(c) ++ Seq(
          (c, "min_len", s"MIN(length($c))::DOUBLE"),
          (c, "max_len", s"MAX(length($c))::DOUBLE"),
          (c, "avg_len", Exact.sqlDavg(s"length($c)")))) ++
        Seq("o_orderdate").flatMap(c => common(c) ++ Seq(
          (c, "min_epoch_ms", s"MIN(epoch_ms($c::TIMESTAMP))::DOUBLE"),
          (c, "max_epoch_ms", s"MAX(epoch_ms($c::TIMESTAMP))::DOUBLE")))
      rows.map { case (cn, m, v) =>
        s"SELECT '$cn' AS col_name, '$m' AS metric, $v AS value FROM orders"
      }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name, metric")
    })

  /** Declarative row-level constraint checks over lineitem:
    * (check_name, violations, passed). Range/domain checks count
    * non-null violators; each checked column carries a paired
    * completeness check so an all-NULL column cannot sail through the
    * gate. All row-level checks share ONE aggregation pass; uniqueness
    * and referential integrity each add one keyed shuffle. */
  def lineitemChecks(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    // coalesce twice: the predicate (a NULL value must not slip past a
    // range check as "not violated" — its absence is the paired
    // completeness check's job, so range checks count non-null
    // violators only and completeness counts the NULLs) and the sum
    // (empty input must report 0 violations, not NULL)
    def viol(name: String, bad: Column): Column =
      struct(lit(name).as("check_name"),
        coalesce(sum(when(coalesce(bad, lit(false)), 1L).otherwise(0L)),
          lit(0L)).as("violations"))
    val rowChecks = lineitem.agg(array(
      viol("quantity_in_1_50", !(col("l_quantity") >= 1 && col("l_quantity") <= 50)),
      viol("quantity_not_null", col("l_quantity").isNull),
      viol("discount_in_0_1", !(col("l_discount") >= 0 && col("l_discount") <= 1)),
      viol("discount_not_null", col("l_discount").isNull),
      viol("extendedprice_positive", !(col("l_extendedprice") > 0)),
      viol("orderkey_not_null", col("l_orderkey").isNull),
      viol("returnflag_domain", !col("l_returnflag").isin("A", "N", "R")),
      viol("returnflag_not_null", col("l_returnflag").isNull)).as("e"))
      .select(explode(col("e")).as("e"))
      .select(col("e.check_name"), col("e.violations"))
    val dupKeys = lineitem
      .groupBy("l_orderkey", "l_linenumber").agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(col("c") - 1), lit(0L)).as("violations"))
      .select(lit("orderkey_linenumber_unique").as("check_name"), col("violations"))
    val orphans = lineitem
      .join(orders.select(col("o_orderkey").as("l_orderkey")), Seq("l_orderkey"), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit("orderkey_in_orders").as("check_name"), col("violations"))
    rowChecks.unionByName(dupKeys).unionByName(orphans)
      .select(col("check_name"), col("violations"),
        when(col("violations") === 0, 1L).otherwise(0L).as("passed"))
      .orderBy("check_name")
  }

  val qChecks: Q = Q(
    "q_quality_checks",
    (s, d) => lineitemChecks(Tables.lineitem(s, d), Tables.orders(s, d)),
    Some("""WITH rowchecks AS (
        SELECT * FROM (
          SELECT 'quantity_in_1_50' AS check_name, coalesce(sum(CASE WHEN coalesce(NOT (l_quantity >= 1 AND l_quantity <= 50), false) THEN 1 ELSE 0 END), 0) AS violations FROM lineitem
          UNION ALL
          SELECT 'quantity_not_null', coalesce(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END), 0) FROM lineitem
          UNION ALL
          SELECT 'discount_in_0_1', coalesce(sum(CASE WHEN coalesce(NOT (l_discount >= 0 AND l_discount <= 1), false) THEN 1 ELSE 0 END), 0) FROM lineitem
          UNION ALL
          SELECT 'discount_not_null', coalesce(sum(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END), 0) FROM lineitem
          UNION ALL
          SELECT 'extendedprice_positive', coalesce(sum(CASE WHEN coalesce(NOT (l_extendedprice > 0), false) THEN 1 ELSE 0 END), 0) FROM lineitem
          UNION ALL
          SELECT 'orderkey_not_null', coalesce(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END), 0) FROM lineitem
          UNION ALL
          SELECT 'returnflag_domain', coalesce(sum(CASE WHEN coalesce(l_returnflag NOT IN ('A','N','R'), false) THEN 1 ELSE 0 END), 0) FROM lineitem
          UNION ALL
          SELECT 'returnflag_not_null', coalesce(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END), 0) FROM lineitem
          UNION ALL
          SELECT 'orderkey_linenumber_unique',
            coalesce((SELECT sum(c - 1) FROM (SELECT count(*) AS c FROM lineitem GROUP BY l_orderkey, l_linenumber) g), 0)
          UNION ALL
          SELECT 'orderkey_in_orders',
            (SELECT count(*) FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL)
        ))
      SELECT check_name, CAST(violations AS BIGINT) AS violations,
        CAST(CASE WHEN violations = 0 THEN 1 ELSE 0 END AS BIGINT) AS passed
      FROM rowchecks ORDER BY check_name"""))

  /** I3: equi-width histogram of a numeric column — the distribution
    * view [[profile]]'s scalar metrics can't give (skew, modes, gaps).
    * Bucket of x = `min(buckets-1, floor((x-lo)·buckets/(hi-lo)))`
    * (the max value clamps into the last bucket); a constant column
    * (hi == lo) lands wholly in bucket 0. Only FINITE values bucket:
    * a NaN would poison `max` (NaN sorts greatest in Spark) and one
    * ±Inf row would make an extremum infinite — either way every
    * finite value collapses into bucket 0 with garbage bounds, the
    * opposite of what a dirty-data audit should report (DuckDB also
    * diverges on both: CAST(floor(NaN)) errors, floor(Inf-Inf)
    * null-skips). Instead the dirty tallies are EXPLICIT output rows
    * with NULL bounds — `bucket -1` = NULL count, `-2` = NaN count,
    * `-3` = ±Inf count — so the audit is self-contained (no
    * cross-referencing [[profile]]'s n_null) and a dirty column is
    * visible in the same glance as its distribution.
    *
    * Scale shape: one aggregation over the pruned column (finite
    * extrema + the three dirty counts, all map-side combinable)
    * collected as a single driver row and re-entering the plan as
    * literals, then a map-side-combinable count on ≤ `buckets` keys.
    * Two scans of one pruned column.
    *
    * Determinism: the bucket expression is a fixed-order chain of IEEE
    * ops on identical operands — bit-identical cross-engine; counts
    * are integers; bucket bounds derive from (lo, hi, index) the same
    * way in both engines.
    *
    * NOTE — eager: the extrema/dirty-count aggregation runs a Spark
    * job at DataFrame-CONSTRUCTION time (the bounds re-enter the plan
    * as literals, the design that keeps the bucket pass one scan), so
    * composing callers pay that action and input errors surface here,
    * not at first consumption. */
  def histogram(df: DataFrame, c: String, buckets: Int = 10): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val spark = df.sparkSession
    import spark.implicits._
    val x = col(c).cast("double")
    val infinite = x === Double.PositiveInfinity || x === Double.NegativeInfinity
    val finite = col(c).isNotNull && !isnan(x) && !infinite
    val st = df.agg(
      min(when(finite, x)).as("lo"),
      max(when(finite, x)).as("hi"),
      count(when(col(c).isNull, lit(1))).as("n_null"),
      count(when(isnan(x), lit(1))).as("n_nan"),
      count(when(infinite, lit(1))).as("n_inf")).head()
    val (lo, hi) =
      if (st.isNullAt(0)) (0.0, 0.0) else (st.getDouble(0), st.getDouble(1))
    val b = lit(buckets)
    val loL = lit(lo)
    val hiL = lit(hi)
    val bucket =
      if (hi == lo) lit(0L)
      else least(lit(buckets - 1).cast("long"),
        floor((x - loL) * b.cast("double") / (hiL - loL)).cast("long"))
    val finiteRows = df.filter(finite)
      .select(bucket.as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"))
      .select(col("bucket"),
        (loL + col("bucket").cast("double") * (hiL - loL) / b.cast("double"))
          .as("bucket_lo"),
        (loL + (col("bucket") + 1).cast("double") * (hiL - loL) / b.cast("double"))
          .as("bucket_hi"),
        col("n"))
    val dirtyRows = Seq((-1L, st.getLong(2)), (-2L, st.getLong(3)), (-3L, st.getLong(4)))
      .toDF("bucket", "n")
      .select(col("bucket"), lit(null).cast("double").as("bucket_lo"),
        lit(null).cast("double").as("bucket_hi"), col("n"))
    finiteRows.unionByName(dirtyRows).orderBy("bucket")
  }

  val qHistogram: Q = Q(
    "q_histogram",
    (s, d) => histogram(Tables.orders(s, d), "o_totalprice"),
    Some("""WITH src AS (
        SELECT CAST(o_totalprice AS DOUBLE) AS x FROM orders),
      st AS (SELECT
          min(CASE WHEN x IS NOT NULL AND NOT isnan(x) AND NOT isinf(x) THEN x END) AS lo,
          max(CASE WHEN x IS NOT NULL AND NOT isnan(x) AND NOT isinf(x) THEN x END) AS hi,
          count(CASE WHEN x IS NULL THEN 1 END) AS n_null,
          count(CASE WHEN isnan(x) THEN 1 END) AS n_nan,
          count(CASE WHEN isinf(x) THEN 1 END) AS n_inf
        FROM src),
      bk AS (
        SELECT CASE WHEN hi = lo THEN 0
          ELSE LEAST(9, CAST(floor((x - lo) * 10.0::DOUBLE / (hi - lo)) AS BIGINT))
          END AS bucket, lo, hi
        FROM src CROSS JOIN st
        WHERE x IS NOT NULL AND NOT isnan(x) AND NOT isinf(x)),
      fin AS (
        SELECT CAST(bucket AS BIGINT) AS bucket,
          lo + CAST(bucket AS DOUBLE) * (hi - lo) / 10.0::DOUBLE AS bucket_lo,
          lo + CAST(bucket + 1 AS DOUBLE) * (hi - lo) / 10.0::DOUBLE AS bucket_hi,
          count(*) AS n
        FROM bk
        GROUP BY bucket, lo, hi),
      dirty AS (
        SELECT CAST(-1 AS BIGINT) AS bucket, CAST(NULL AS DOUBLE) AS bucket_lo,
          CAST(NULL AS DOUBLE) AS bucket_hi, n_null AS n FROM st
        UNION ALL
        SELECT CAST(-2 AS BIGINT), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), n_nan FROM st
        UNION ALL
        SELECT CAST(-3 AS BIGINT), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), n_inf FROM st)
      SELECT bucket, bucket_lo, bucket_hi, CAST(n AS BIGINT) AS n
      FROM (SELECT * FROM fin UNION ALL SELECT * FROM dirty)
      ORDER BY bucket"""))

  /** I4: one-pass Pearson correlation matrix over fixed-decimal numeric
    * columns — the Deequ "Correlation" analyzer, computed the way a
    * 100 TB profile must be: ALL moments (n, Σx, Σx², Σxy per pair) in
    * ONE map-side-combinable aggregation over ONE scan; the k² final
    * formula evaluations are O(columns²) driver arithmetic on the
    * collected 1-row moment frame.
    *
    * Determinism: values quantize to integer units first
    * (round(x·scale) — exact recovery for fixed-decimal data like
    * prices/rates, where raw float sums are partition-order-dependent),
    * the moment sums are exact DECIMAL(38) integer sums (commutative),
    * and the corr formula is a short mirrored double chain over those
    * exact integers — each step identically rounded on any engine, so
    * the result is reproducible cluster-to-cluster and hash-matches
    * DuckDB. Zero-variance columns yield NaN (0/0) on both engines.
    * NULL handling is LISTWISE deletion: rows with a NULL in ANY
    * correlated column drop before the moments, so every moment is
    * computed over the same support (mixing count(*) with null-skipping
    * sums silently corrupts the formula); an empty or all-NULL input
    * returns an empty frame. */
  def correlations(
      df: DataFrame, cols: Seq[String], scale: Double = 100.0): DataFrame = {
    require(cols.size >= 2, "need at least two columns to correlate")
    val spark = df.sparkSession
    import spark.implicits._
    val sorted = cols.sorted
    val pairs = for {
      i <- sorted.indices; j <- (i + 1) until sorted.size
    } yield (sorted(i), sorted(j))
    val quantized = df.select(sorted.map(c =>
      round(col(c) * scale).cast("long").as(c)): _*).na.drop()
    // decimal(19,0) operands BEFORE the multiply: a per-row Long
    // product overflows at |x·scale| ≳ 3e9 (epoch-millis territory) —
    // ANSI kills the job, non-ANSI silently wraps. The (19,0)×(19,0)
    // decimal product is exact through the 2^63-scale values Long
    // quantization admits.
    def dec(c: String) = col(c).cast("decimal(19,0)")
    val aggs =
      sorted.map(c => sum(col(c).cast("decimal(38,0)")).as(s"s_$c")) ++
      sorted.map(c => sum((dec(c) * dec(c)).cast("decimal(38,0)")).as(s"ss_$c")) ++
      pairs.map { case (a, b) =>
        sum((dec(a) * dec(b)).cast("decimal(38,0)")).as(s"sp_${a}_$b") }
    val row = quantized.agg(count(lit(1)).as("n"), aggs: _*).head()
    if (row.getLong(0) == 0L)
      return Seq.empty[(String, String, Double)].toDF("col_x", "col_y", "corr")
    val n = row.getLong(0).toDouble
    // decimal → double via an exact hi·2^26 + lo split: a direct cast
    // of a > 2^53 sum rounds, and DuckDB's 128-bit-int cast rounds
    // DIFFERENTLY (double-rounded halves — observed 1-ULP corr drift
    // at sf0.1). hi and lo are each < 2^53 (exact casts, for sums up
    // to 2^79), the multiply is an exponent shift (exact), and the one
    // rounding add sees identical operands on both engines.
    def m(name: String): Double = {
      val i = row.fieldIndex(name)
      // a decimal(38,0) overflow yields NULL under non-ANSI Spark —
      // fail with the cause, not an NPE three calls later (DuckDB's
      // HUGEINT fails differently on the same edge, so the engines
      // would also silently diverge)
      require(!row.isNullAt(i),
        s"correlations: moment $name overflowed decimal(38) — values too " +
          "large for exact integer moments at this scale/row count")
      val bi = row.getDecimal(i).toBigInteger
      val Array(hi, lo) = bi.divideAndRemainder(java.math.BigInteger.valueOf(1L << 26))
      hi.doubleValue * 67108864.0 + lo.doubleValue
    }
    val out = pairs.map { case (a, b) =>
      val (sa, sb) = (m(s"s_$a"), m(s"s_$b"))
      val num = n * m(s"sp_${a}_$b") - sa * sb
      val den = math.sqrt(n * m(s"ss_$a") - sa * sa) *
        math.sqrt(n * m(s"ss_$b") - sb * sb)
      (a, b, num / den)
    }
    out.toDF("col_x", "col_y", "corr").orderBy("col_x", "col_y")
  }

  private val CorrCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  val qCorrelations: Q = Q(
    "q_correlations",
    (s, d) => correlations(Tables.lineitem(s, d), CorrCols),
    Some {
      val sorted = CorrCols.sorted
      val pairs = for {
        i <- sorted.indices; j <- (i + 1) until sorted.size
      } yield (sorted(i), sorted(j))
      val qCols = sorted.map(c =>
        s"CAST(round($c * 100.0::DOUBLE) AS BIGINT) AS $c").mkString(", ")
      // sum(BIGINT) is HUGEINT (exact). The hugeint→double cast
      // double-rounds through 64-bit halves, so mirror the Spark
      // driver's EXACT hi·2^26 + lo split instead: hi and lo cast
      // exactly, the multiply is an exponent shift, the one rounding
      // add sees the same operands as the JVM side.
      def dbl(x: String) =
        s"(CAST(($x) // 67108864 AS DOUBLE) * 67108864.0::DOUBLE + " +
          s"CAST(($x) % 67108864 AS DOUBLE))"
      // HUGEINT products mirror the Spark side's pre-multiply decimal
      // widening (BIGINT * BIGINT overflows for epoch-scale values)
      val moments = (
        sorted.map(c => s"sum($c) AS s_$c") ++
        sorted.map(c => s"sum(CAST($c AS HUGEINT) * $c) AS ss_$c") ++
        pairs.map { case (a, b) =>
          s"sum(CAST($a AS HUGEINT) * $b) AS sp_${a}_$b" }).mkString(", ")
      val rows = pairs.map { case (a, b) =>
        s"""SELECT '$a' AS col_x, '$b' AS col_y,
          (CAST(n AS DOUBLE) * ${dbl(s"sp_${a}_$b")}
             - ${dbl(s"s_$a")} * ${dbl(s"s_$b")})
          / (sqrt(CAST(n AS DOUBLE) * ${dbl(s"ss_$a")}
               - ${dbl(s"s_$a")} * ${dbl(s"s_$a")})
             * sqrt(CAST(n AS DOUBLE) * ${dbl(s"ss_$b")}
               - ${dbl(s"s_$b")} * ${dbl(s"s_$b")})) AS corr
          FROM m"""
      }.mkString(" UNION ALL ")
      s"""WITH q AS (SELECT $qCols FROM lineitem
          WHERE ${CorrCols.sorted.map(c => s"$c IS NOT NULL").mkString(" AND ")}),
        m AS (SELECT count(*) AS n, $moments FROM q)
        $rows ORDER BY col_x, col_y"""
    })

  /** Fixed-point quantization scale for [[embedDrift]] centroids (the
    * E5 rule: ×2^12 is a pure exponent shift, exact in binary FP). */
  private val DriftQ = 4096.0

  /** I5: embedding snapshot drift — the input-trust check for the
    * VECTOR side of the lake (I1/I2 profile scalars; nothing watched
    * the embeddings): given two snapshots of the same corpus (two
    * crawl batches, or the same docs re-embedded after a model bump),
    * per label report how far the label's centroid moved:
    *
    *   (label, n_a, n_b, max_abs_shift)
    *
    * max_abs_shift = the Chebyshev (max-over-dims) distance between
    * the two per-label centroids of 1/4096-quantized components — the
    * alarm that a label's population shifted (ingest drift) or an
    * embedding-model change silently re-mapped the space, BEFORE an
    * IVF/PQ index trained on snapshot A serves snapshot B traffic.
    * A label present in only one snapshot reports the missing side's
    * count as 0 and a NULL shift (no centroid to compare).
    *
    * Determinism: per (label, dim) the component sums are the E5
    * integer fixed-point aggregation (order-independent, exact); each
    * per-dim centroid is then ONE double division of two exact
    * integers, the difference/abs are single IEEE ops on identical
    * operands cross-engine, and the final max is commutative — no
    * order-dependent float accumulation anywhere.
    *
    * Scale shape: two posexplode + hash-agg passes on label×dim keys
    * (tiny, skew-free), a full outer join on that same key space, and
    * a final agg to the label domain. Vectors never shuffle — only
    * quantized (label, dim, sum) rows do. */
  def embedDrift(snapA: DataFrame, snapB: DataFrame): DataFrame = {
    def moments(df: DataFrame, nn: String, qn: String): DataFrame = df
      .select(col("label").cast("long").as("label"),
        posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("label"), col("dim").cast("long").as("dim"),
        round(col("v").cast("double") * DriftQ).cast("long").as("q"))
      .groupBy("label", "dim")
      .agg(count(lit(1)).as(nn), sum(col("q")).as(qn))
    val a = moments(snapA, "n_a", "qa")
    val b = moments(snapB, "n_b", "qb")
    val na = coalesce(col("n_a"), lit(0L))
    val nb = coalesce(col("n_b"), lit(0L))
    a.join(b, Seq("label", "dim"), "full")
      .select(col("label"), na.as("na"), nb.as("nb"),
        when(na > 0L && nb > 0L,
          abs(coalesce(col("qa"), lit(0L)).cast("double") / na -
            coalesce(col("qb"), lit(0L)).cast("double") / nb) / DriftQ)
          .as("shift"))
      .groupBy("label")
      .agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
        max(col("shift")).as("max_abs_shift"))
      .orderBy("label")
  }

  /** Oracle row: the deterministic parity split of the embeddings table
    * plays the two snapshots (vec_id mod 2 — reproducible in SQL; real
    * callers pass two actual snapshot frames). */
  val qEmbedDrift: Q = Q(
    "q_embed_drift",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      embedDrift(emb.filter(col("vec_id") % 2 === 0),
        emb.filter(col("vec_id") % 2 === 1))
    },
    Some("""WITH exa AS (
        SELECT CAST(label AS BIGINT) AS label,
          CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
          unnest(embedding) AS v
        FROM embeddings WHERE vec_id % 2 = 0),
      aa AS (
        SELECT label, dim, CAST(count(*) AS BIGINT) AS na,
          CAST(sum(CAST(round(CAST(v AS DOUBLE) * 4096.0::DOUBLE) AS BIGINT)) AS BIGINT) AS qa
        FROM exa GROUP BY 1, 2),
      exb AS (
        SELECT CAST(label AS BIGINT) AS label,
          CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
          unnest(embedding) AS v
        FROM embeddings WHERE vec_id % 2 = 1),
      ab AS (
        SELECT label, dim, CAST(count(*) AS BIGINT) AS nb,
          CAST(sum(CAST(round(CAST(v AS DOUBLE) * 4096.0::DOUBLE) AS BIGINT)) AS BIGINT) AS qb
        FROM exb GROUP BY 1, 2),
      j AS (
        SELECT coalesce(aa.label, ab.label) AS label,
          coalesce(na, 0) AS na, coalesce(qa, 0) AS qa,
          coalesce(nb, 0) AS nb, coalesce(qb, 0) AS qb
        FROM aa FULL JOIN ab ON aa.label = ab.label AND aa.dim = ab.dim)
      SELECT label, CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b,
        max(CASE WHEN na > 0 AND nb > 0
          THEN abs(CAST(qa AS DOUBLE) / na - CAST(qb AS DOUBLE) / nb) / 4096.0::DOUBLE
          END) AS max_abs_shift
      FROM j GROUP BY label ORDER BY label"""))

  /** I6: grouped APPROXIMATE quantiles — the sketch path the exact
    * `q_percentiles` row cannot take at 100 TB (exact order statistics
    * sort the group; a quantile sketch is one map-side-combinable
    * aggregation with bounded state). Spark's built-in
    * `approx_percentile` (Greenwald–Khanna summaries, codegen'd):
    * rank error is bounded by n/accuracy per group, and the sketches
    * merge associatively, so the plan is a single scan + one narrow
    * shuffle of per-partition sketches whatever the corpus size.
    *
    * Oracle technique (the E7 losslessness pattern, applied to a
    * SKETCH): at `accuracy >= group size` GK compression never drops
    * a sample, so the summary holds every value and the query is
    * EXACT — equal to `quantile_disc` — and merge-order independent
    * (nothing approximated, so partitioning cannot show). The oracle
    * row runs at that exhaustive setting; callers at corpus scale
    * drop `accuracy` to the memory they can afford (the default
    * 1000 ≈ 0.1% rank error), where the result may legitimately vary
    * with partitioning — the documented sketch contract, spec'd via
    * the rank-error bound instead of a hash. */
  def approxQuantiles(
      df: DataFrame,
      valueCol: String,
      groupCol: String,
      probs: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.95),
      accuracy: Int = 1000): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
      s"probs must be in [0, 1], got $probs")
    require(accuracy >= 1, s"accuracy must be positive, got $accuracy")
    df.groupBy(groupCol)
      .agg(count(col(valueCol)).as("n"),
        percentile_approx(col(valueCol),
          array(probs.map(lit): _*), lit(accuracy)).as("quantiles"))
      .orderBy(groupCol)
  }

  /** Accuracy at which the GK summary is exhaustive for any SF's
    * groups (largest group at sf0.1 is 15k rows; 10M leaves margin). */
  private val ExactAccuracy = 10000000

  val qApproxQuantiles: Q = Q(
    "q_approx_quantiles",
    (s, d) => {
      val probs = Seq(0.25, 0.5, 0.75, 0.95)
      approxQuantiles(Tables.customer(s, d), "c_acctbal", "c_mktsegment",
          probs, ExactAccuracy)
        .select(col("c_mktsegment"), col("n"),
          element_at(col("quantiles"), 1).as("p25"),
          element_at(col("quantiles"), 2).as("p50"),
          element_at(col("quantiles"), 3).as("p75"),
          element_at(col("quantiles"), 4).as("p95"))
    },
    Some("""SELECT c_mktsegment, count(c_acctbal) AS n,
        quantile_disc(c_acctbal, 0.25) AS p25,
        quantile_disc(c_acctbal, 0.5)  AS p50,
        quantile_disc(c_acctbal, 0.75) AS p75,
        quantile_disc(c_acctbal, 0.95) AS p95
      FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** I8: chi-square independence test of two categorical columns — the
    * input-trust check for CATEGORICAL drift (I4 covers numeric pairs):
    * "did source stop predicting lang?" asked statistically. X² =
    * Σ_cells (o − e)²/e over the FULL R×C grid (absent combinations
    * contribute their full expected mass — the part an observed-only
    * sum silently drops), e = rowTot·colTot/N.
    *
    * Determinism: every term is a fixed-shape chain of IEEE double
    * ops on exactly-cast integer counts — ((o·N) − (rt·ct))² /
    * ((N·rt)·ct) — each operation correctly rounded identically on
    * both engines (the BM25 precedent: determinism needs identical
    * ASTs, not integer arithmetic), summed by an ordered fold over
    * the (a, b)-sorted cells, never a float `sum()`.
    *
    * Scale shape: one (a, b) count aggregation over one scan
    * (map-side combinable, key space = the category domain —
    * documented bound, same contract as I3/I5); marginals, the R×C
    * expected grid (a broadcast-sized cross join of the two marginal
    * frames), and the fold all run on category-domain-sized frames.
    * Output is ONE row: (n, r, c, dof, chi2). */
  def chisq(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    // NULL categories are excluded (standard chi-square contract): a
    // NULL group would carry marginal mass the equality-joined grid
    // can never match (NULL != NULL), silently inflating the statistic
    val cells = df.select(col(aCol).as("a"), col(bCol).as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
      .groupBy("a", "b").agg(count(lit(1)).as("o"))
    val rt = cells.groupBy("a").agg(sum(col("o")).as("rt"))
    val ct = cells.groupBy("b").agg(sum(col("o")).as("ct"))
    val grid = rt.crossJoin(ct)
      .join(cells, Seq("a", "b"), "left")
      .select(col("a"), col("b"), col("rt"), col("ct"),
        coalesce(col("o"), lit(0L)).as("o"))
    val n = cells.agg(sum(col("o")).as("n"),
      count_distinct(col("a")).as("r"), count_distinct(col("b")).as("c"))
    val term = {
      val o = col("o").cast("double"); val nn = col("n").cast("double")
      val r = col("rt").cast("double"); val c = col("ct").cast("double")
      val num = (o * nn - r * c) * (o * nn - r * c)
      num / (nn * r * c)
    }
    grid.crossJoin(broadcast(n))
      .select(col("n"), col("r"), col("c"),
        struct(col("a"), col("b"), term.as("t")).as("cell"))
      .groupBy("n", "r", "c")
      .agg(sort_array(collect_list(col("cell"))).as("cells"))
      .select(col("n"), col("r"), col("c"),
        ((col("r") - 1L) * (col("c") - 1L)).as("dof"),
        aggregate(col("cells"), lit(0.0),
          (acc, x) => acc + x.getField("t")).as("chi2"))
  }

  val qChisq: Q = Q(
    "q_chisq",
    (s, d) => chisq(Tables.documents(s, d), "lang", "source"),
    Some("""WITH cells AS (
        SELECT lang AS a, source AS b, count(*) AS o
        FROM documents
        WHERE lang IS NOT NULL AND source IS NOT NULL
        GROUP BY 1, 2),
      rt AS (SELECT a, sum(o) AS rt FROM cells GROUP BY 1),
      ct AS (SELECT b, sum(o) AS ct FROM cells GROUP BY 1),
      n AS (SELECT CAST(sum(o) AS BIGINT) AS n,
        count(DISTINCT a) AS r, count(DISTINCT b) AS c FROM cells),
      grid AS (
        SELECT rt.a, ct.b, rt.rt, ct.ct, coalesce(cells.o, 0) AS o
        FROM rt CROSS JOIN ct
        LEFT JOIN cells ON cells.a = rt.a AND cells.b = ct.b),
      terms AS (
        SELECT n, r, c, a, b,
          ((CAST(o AS DOUBLE) * CAST(n AS DOUBLE)
              - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE))
           * (CAST(o AS DOUBLE) * CAST(n AS DOUBLE)
              - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)))
          / ((CAST(n AS DOUBLE) * CAST(rt AS DOUBLE)) * CAST(ct AS DOUBLE))
            AS t
        FROM grid CROSS JOIN n)
      SELECT n, r, c, (r - 1) * (c - 1) AS dof,
        list_reduce(list_prepend(0.0::DOUBLE, list(t ORDER BY a, b)),
          (acc, x) -> acc + x) AS chi2
      FROM terms GROUP BY 1, 2, 3"""))

  /** Quantization scale for [[psi]]'s per-bucket ln: 2^20 fixed point
    * (the C23/DSIR lesson — individual ln calls differ by 1 ULP
    * JVM-vs-libm often enough that a multi-term sum drifts; rounding
    * each ln to 2^-20 absorbs the ULP on both engines). */
  private val PsiLnQ = (1L << 20).toDouble

  /** I9: Population Stability Index between two snapshots of the same
    * table — THE drift statistic ops teams alert on (banking
    * scorecards onward): per column, PSI = Σ_bins (p_cur − p_ref) ·
    * ln(p_cur / p_ref), with conventional alert bands at 0.1 (watch)
    * and 0.25 (act). Completes the input-trust drift layer: I5 covers
    * embeddings, I8 association between two categorical columns, I4
    * numeric correlation — PSI covers PER-COLUMN distribution shift,
    * numeric and categorical, between snapshots.
    *
    * Binning: numeric columns bucket on the REFERENCE snapshot's
    * [min, max] range (I3's fixed-order bucket chain) into `buckets`
    * equal-width bins — current-snapshot values OUTSIDE the reference
    * range clamp into the edge bins, which is exactly the mass a
    * drift alarm must see; all `buckets` bins participate even when
    * empty. Categorical columns bin by value over the UNION of
    * observed categories. NULL / NaN / ±Inf values are excluded from
    * both sides (the I8 contract; profile their counts via I1/I3).
    *
    * Zero-count bins: add-one (Laplace) smoothing — p = (c + 1) /
    * (n + bins) — an exact-rational convention (no magic epsilon)
    * that keeps every ln finite and both engines bit-identical.
    *
    * Determinism: counts are integers; proportions are single
    * divisions of exactly-cast longs; each ln is quantized to 2^-20
    * fixed point BEFORE use (see [[PsiLnQ]]); per-column terms are
    * summed by an ordered fold over the bin key (the I8 contract),
    * never a float `sum()`.
    *
    * Scale shape: one pass per snapshot — project the per-column bin
    * keys as an array, explode, one map-side-combinable count on
    * (column, key) whose key space is the bin/category domain (the
    * I3/I8 documented bound); everything downstream runs on
    * domain-sized frames. One eager bounds aggregation over the
    * reference's numeric columns (the I3 design: bounds re-enter the
    * plan as literals, keeping the bucket pass one scan). */
  def psi(
      ref: DataFrame,
      cur: DataFrame,
      numCols: Seq[String],
      catCols: Seq[String],
      buckets: Int = 10): DataFrame = {
    require(numCols.nonEmpty || catCols.nonEmpty,
      "psi: at least one column required")
    require(numCols.intersect(catCols).isEmpty,
      s"psi: column(s) ${numCols.intersect(catCols).mkString(", ")} appear " +
        "in both numCols and catCols — bin keys are namespaced per column, " +
        "so numeric bucket keys and raw category values would merge into " +
        "one grid and yield a meaningless PSI; list each column once")
    require(buckets > 1, s"buckets must be > 1, got $buckets")
    val spark = ref.sparkSession
    import spark.implicits._
    def xOf(c: String): Column = col(c).cast("double")
    def finite(c: String): Column = {
      val x = xOf(c)
      col(c).isNotNull && !isnan(x) &&
        x =!= Double.PositiveInfinity && x =!= Double.NegativeInfinity
    }
    // reference bounds per numeric column, ONE aggregation action
    val bounds: Map[String, (Double, Double)] =
      if (numCols.isEmpty) Map.empty
      else {
        val aggs = numCols.flatMap { c =>
          Seq(min(when(finite(c), xOf(c))), max(when(finite(c), xOf(c))))
        }
        val r = ref.agg(aggs.head, aggs.tail: _*).head()
        numCols.zipWithIndex.map { case (c, i) =>
          // fail loudly on a vacuous reference: PSI against a column
          // with no finite reference values is meaningless, and a
          // silent (0.0, 0.0) fallback would bin arbitrary current
          // values as if the reference ranged over [0, 0] (and
          // diverge from the oracle, whose NULL bounds drop rows)
          require(!r.isNullAt(2 * i),
            s"psi: reference snapshot has no finite values in numeric " +
              s"column '$c' — profile the column (I1/I3) instead of " +
              "computing drift against a vacuous reference")
          c -> (r.getDouble(2 * i), r.getDouble(2 * i + 1))
        }.toMap
      }
    // bin key per column: zero-padded bucket index (numeric) or the
    // category value (categorical); NULL key = excluded row. Padded
    // digits and raw category strings compare identically under both
    // engines' binary collation, which the ordered fold relies on.
    def keyFor(c: String): Column = {
      val (lo, hi) = bounds(c)
      val b =
        if (hi == lo) lit(0L)
        else greatest(lit(0L), least(lit(buckets - 1L),
          floor((xOf(c) - lit(lo)) * lit(buckets.toDouble) / (lit(hi) - lit(lo)))
            .cast("long")))
      when(finite(c), format_string("%05d", b))
    }
    def keyed(df: DataFrame): DataFrame =
      df.select(array(
          numCols.map(c => struct(lit(c).as("col_name"), keyFor(c).as("key"))) ++
            catCols.map(c => struct(lit(c).as("col_name"),
              col(c).cast("string").as("key"))): _*).as("kcs"))
        .select(explode(col("kcs")).as("kc"))
        .select(col("kc.col_name").as("col_name"), col("kc.key").as("key"))
        .filter(col("key").isNotNull)
    val ra = keyed(ref).groupBy("col_name", "key").agg(count(lit(1)).as("c_ref"))
    val cu = keyed(cur).groupBy("col_name", "key").agg(count(lit(1)).as("c_cur"))
    // bin grid: the full 0..buckets-1 range for every numeric column
    // (absent bins still carry smoothed mass) + the union of observed
    // categories — a domain-sized frame
    val numGrid = numCols.flatMap(c =>
      (0 until buckets).map(i => (c, f"$i%05d"))).toDF("col_name", "key")
    val grid = ra.select("col_name", "key")
      .union(cu.select("col_name", "key"))
      .union(numGrid)
      .distinct()
    val joined = grid
      .join(ra, Seq("col_name", "key"), "left")
      .join(cu, Seq("col_name", "key"), "left")
      .select(col("col_name"), col("key"),
        coalesce(col("c_ref"), lit(0L)).as("c_ref"),
        coalesce(col("c_cur"), lit(0L)).as("c_cur"))
    val tot = joined.groupBy("col_name")
      .agg(sum("c_ref").as("n_ref"), sum("c_cur").as("n_cur"),
        count(lit(1)).as("n_bins"))
    val term = {
      val pr = (col("c_ref") + lit(1L)).cast("double") /
        (col("n_ref") + col("n_bins")).cast("double")
      val pc = (col("c_cur") + lit(1L)).cast("double") /
        (col("n_cur") + col("n_bins")).cast("double")
      val qln = round(log(pc / pr) * lit(PsiLnQ)).cast("long")
      (pc - pr) * (qln.cast("double") / lit(PsiLnQ))
    }
    joined.join(tot, Seq("col_name"))
      .select(col("col_name"), col("n_ref"), col("n_cur"), col("n_bins"),
        struct(col("key"), term.as("t")).as("cell"))
      .groupBy("col_name", "n_ref", "n_cur", "n_bins")
      .agg(sort_array(collect_list(col("cell"))).as("cells"))
      .select(col("col_name"), col("n_ref"), col("n_cur"), col("n_bins"),
        aggregate(col("cells"), lit(0.0),
          (acc, x) => acc + x.getField("t")).as("psi"))
      .orderBy("col_name")
  }

  /** The oracle row splits orders at the corpus's median order date
    * (1995-01-01..2001-08-01 — the synthetic generator draws columns
    * time-stationary, so this is the QUIET baseline an ops team stares
    * at between incidents: small smoothing-driven PSI on every column,
    * all three bin mechanics — numeric bucketing, two category
    * domains — exercised and hashed). The ALARM case (planted
    * categorical swap and numeric shift crossing the 0.25 band) is
    * pinned in ProfileSpec, where drift can be constructed. */
  val qPsi: Q = Q(
    "q_psi",
    (s, d) => {
      val o = Tables.orders(s, d)
      val cut = lit("1998-04-25 00:00:00").cast("timestamp")
      psi(o.filter(col("o_orderdate") < cut),
        o.filter(col("o_orderdate") >= cut),
        numCols = Seq("o_totalprice"),
        catCols = Seq("o_orderstatus", "o_orderpriority"))
    },
    Some {
      val q = "1048576.0::DOUBLE"
      def keysFor(src: String): String =
        s"""SELECT 'o_totalprice' AS col_name,
            printf('%05d', CASE WHEN hi = lo THEN 0
              ELSE GREATEST(0, LEAST(9,
                CAST(floor((x - lo) * 10.0::DOUBLE / (hi - lo)) AS BIGINT)))
              END) AS key
          FROM (SELECT CAST(o_totalprice AS DOUBLE) AS x FROM $src) s
          CROSS JOIN bounds
          WHERE x IS NOT NULL AND NOT isnan(x) AND NOT isinf(x)
        UNION ALL
        SELECT 'o_orderstatus', CAST(o_orderstatus AS VARCHAR)
          FROM $src WHERE o_orderstatus IS NOT NULL
        UNION ALL
        SELECT 'o_orderpriority', CAST(o_orderpriority AS VARCHAR)
          FROM $src WHERE o_orderpriority IS NOT NULL"""
      s"""WITH ref AS (SELECT * FROM orders
          WHERE o_orderdate < TIMESTAMP '1998-04-25 00:00:00'),
        cur AS (SELECT * FROM orders
          WHERE o_orderdate >= TIMESTAMP '1998-04-25 00:00:00'),
        bounds AS (SELECT
            min(CASE WHEN x IS NOT NULL AND NOT isnan(x) AND NOT isinf(x)
              THEN x END) AS lo,
            max(CASE WHEN x IS NOT NULL AND NOT isnan(x) AND NOT isinf(x)
              THEN x END) AS hi
          FROM (SELECT CAST(o_totalprice AS DOUBLE) AS x FROM ref) s),
        kr AS (${keysFor("ref")}),
        kc AS (${keysFor("cur")}),
        ra AS (SELECT col_name, key, count(*) AS c_ref FROM kr GROUP BY 1, 2),
        cu AS (SELECT col_name, key, count(*) AS c_cur FROM kc GROUP BY 1, 2),
        numgrid AS (SELECT 'o_totalprice' AS col_name, printf('%05d', i) AS key
          FROM range(0, 10) t(i)),
        grid AS (SELECT DISTINCT col_name, key FROM (
          SELECT col_name, key FROM ra UNION ALL
          SELECT col_name, key FROM cu UNION ALL
          SELECT col_name, key FROM numgrid)),
        j AS (SELECT g.col_name, g.key,
            coalesce(ra.c_ref, 0) AS c_ref, coalesce(cu.c_cur, 0) AS c_cur
          FROM grid g
          LEFT JOIN ra ON g.col_name = ra.col_name AND g.key = ra.key
          LEFT JOIN cu ON g.col_name = cu.col_name AND g.key = cu.key),
        tot AS (SELECT col_name, CAST(sum(c_ref) AS BIGINT) AS n_ref,
            CAST(sum(c_cur) AS BIGINT) AS n_cur, count(*) AS n_bins
          FROM j GROUP BY 1),
        terms AS (SELECT j.col_name, j.key, n_ref, n_cur, n_bins,
            CAST(c_ref + 1 AS DOUBLE) / CAST(n_ref + n_bins AS DOUBLE) AS pr,
            CAST(c_cur + 1 AS DOUBLE) / CAST(n_cur + n_bins AS DOUBLE) AS pc,
            CAST(round(ln(pc / pr) * $q) AS BIGINT) AS qln,
            (pc - pr) * (CAST(qln AS DOUBLE) / $q) AS t
          FROM j JOIN tot ON j.col_name = tot.col_name)
        SELECT col_name, n_ref, n_cur, n_bins,
          list_reduce(list_prepend(0.0::DOUBLE, list(t ORDER BY key)),
            (acc, x) -> acc + x) AS psi
        FROM terms GROUP BY 1, 2, 3, 4 ORDER BY col_name"""
    })

  val all: Seq[Q] =
    Seq(qProfile, qChecks, qHistogram, qCorrelations, qEmbedDrift,
      qApproxQuantiles, qChisq, qPsi)
}
