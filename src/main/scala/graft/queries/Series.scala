package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** B15: time-series similarity search over the events table — "which
  * users have near-identical daily activity curves?" (the
  * time-series-similarity workload of the retrieved EDBT '19 streaming
  * paper family, relational): per user, the daily value series as an
  * EXACT integer vector (cents), pairs within squared-Euclidean `eps`.
  *
  * Everything is integer arithmetic end to end — values quantize to
  * cents (round-half-away matches across engines), missing days fill
  * with 0, the distance is Σ (aᵢ−bᵢ)² of longs folded in element
  * order — so the oracle compares hash-exactly with no float anywhere.
  *
  * Scale shape (GEMINI-style lower-bound blocking): the total-sum
  * 1-D grid. By Cauchy–Schwarz, (Σᵢ (aᵢ−bᵢ))² ≤ L·dist²(a,b), so
  * dist² ≤ eps ⟹ |total(a) − total(b)| ≤ √(L·eps) = W. Each series
  * keys into cell = total div W and probes {cell−1, cell, cell+1}:
  * every qualifying pair lands in adjacent cells — candidate
  * generation is an equi-join on the cell key, NEVER the users²
  * cross product, and is PROVABLY lossless (the naive all-pairs SQL
  * is the oracle, hash-equality the proof — the D4b pattern). W is
  * computed IN-PLAN from the broadcast (L) bounds frame; series are
  * per-user arrays of ≤ span days (one shuffle on user_id), and the
  * exact rescore touches candidate pairs only. */
object Series {

  private[this] val cache = new graft.ops.PlanCache(capacity = 2)

  /** PAA segment count for the candidate-stage lower bound. */
  private val Segs = 5

  /** Per-user dense integer day-series, total-sum blocking cell, and
    * the [[Segs]] PAA segment sums — one frame, memo-persisted so the
    * slim candidate branch and the array rescore branch share it. */
  private def seriesFrame(events: DataFrame, eps: Long): DataFrame = {
    val day = events
      .select(col("user_id"),
        expr("datediff(to_date(ts), DATE'1970-01-01')").as("ed"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy("user_id", "ed").agg(sum(col("cents")).as("cents"))
    val bounds = day.agg(min(col("ed")).as("d0"), max(col("ed")).as("d1"))
    val segCols = (0 until Segs).map(j =>
      sum(when(expr(s"(ed - d0) * $Segs div (d1 - d0 + 1)") === j.toLong,
        col("cents")).otherwise(0L)).as(s"g$j"))
    val aggCols: Seq[org.apache.spark.sql.Column] =
      Seq(map_from_entries(collect_list(
          struct((col("ed") - col("d0")).as("idx"), col("cents")))).as("m"),
        max(col("d1") - col("d0") + 1L).as("len")) ++
        segCols :+ sum(col("cents")).as("total")
    cache.memo(day.crossJoin(broadcast(bounds))
      .groupBy("user_id")
      .agg(aggCols.head, aggCols.tail: _*)
      .select((Seq(col("user_id"),
        expr("transform(sequence(0, CAST(len - 1 AS INT)), i -> coalesce(m[CAST(i AS BIGINT)], 0L))")
          .as("s"),
        col("len"), col("total"),
        expr(s"greatest(CAST(ceil(sqrt(CAST(len AS DOUBLE) * $eps.0)) AS BIGINT), 1L)")
          .as("w")) ++ (0 until Segs).map(j => col(s"g$j"))): _*)
      .withColumn("cell", expr("total div w")))
  }

  /** Pairs of users whose integer day-series lie within squared
    * Euclidean distance `eps` (cents²). Output (u1, u2, dist2),
    * u1 < u2, ordered.
    *
    * Two-stage, both stages lossless: (1) SLIM candidates — the cell
    * equi-join carries only (user, cell, segment sums), never the
    * series arrays ("payloads never shuffle through candidate
    * generation"), and prunes by the PAA bound
    * Σ_j (Δg_j)² ≤ ceil(L/segs)·eps (per-segment Cauchy–Schwarz —
    * a NECESSARY condition, no false dismissals); (2) survivors alone
    * join the arrays back by user id for the exact integer rescore. */
  def seriesPairs(events: DataFrame, eps: Long = 3200000000L): DataFrame = {
    require(eps > 0, s"eps must be positive (got $eps)")
    val sf = seriesFrame(events, eps)
    val slimCols = Seq(col("user_id"), col("cell"), col("len")) ++
      (0 until Segs).map(j => col(s"g$j"))
    val slim = sf.select(slimCols: _*)
    val left = slim.select((Seq(col("user_id").as("u1"), col("len")) ++
      (0 until Segs).map(j => col(s"g$j").as(s"a$j")) :+
      explode(array(col("cell") - 1L, col("cell"), col("cell") + 1L)).as("bc")): _*)
    val right = slim.select((Seq(col("user_id").as("u2"),
      col("cell").as("bc")) ++
      (0 until Segs).map(j => col(s"g$j").as(s"b$j"))): _*)
    val paaBound = (0 until Segs)
      .map(j => (col(s"a$j") - col(s"b$j")) * (col(s"a$j") - col(s"b$j")))
      .reduce(_ + _)
    val cand = left.join(right, "bc")
      .filter(col("u1") < col("u2"))
      .filter(paaBound <=
        expr(s"CAST(ceil(CAST(len AS DOUBLE) / $Segs.0) AS BIGINT)") * eps)
      .select(col("u1"), col("u2"))
    val arrays = sf.select(col("user_id"), col("s"))
    cand
      .join(arrays.select(col("user_id").as("u1"), col("s").as("s1")), "u1")
      .join(arrays.select(col("user_id").as("u2"), col("s").as("s2")), "u2")
      .withColumn("dist2",
        expr("aggregate(zip_with(s1, s2, (x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v)"))
      .filter(col("dist2") <= eps)
      .select(col("u1"), col("u2"), col("dist2"))
      .orderBy("u1", "u2")
  }

  val qSeriesPairs: Q = Q(
    "q_series_pairs",
    (s, d) => seriesPairs(Tables.events(s, d)),
    Some("""WITH e AS (
        SELECT user_id,
          date_diff('day', DATE '1970-01-01', CAST(ts::TIMESTAMP AS DATE)) AS ed,
          CAST(round(value * 100) AS BIGINT) AS cents
        FROM events),
      day AS (SELECT user_id, ed, sum(cents) AS cents FROM e GROUP BY 1, 2),
      b AS (SELECT min(ed) AS d0, max(ed) AS d1 FROM day),
      users AS (SELECT DISTINCT user_id FROM day),
      dense AS (
        SELECT u.user_id, r.i AS idx, coalesce(day.cents, 0) AS cents
        FROM users u
        CROSS JOIN (SELECT unnest(range(0,
          (SELECT CAST(d1 - d0 + 1 AS BIGINT) FROM b))) AS i) r
        LEFT JOIN day ON day.user_id = u.user_id
          AND day.ed = r.i + (SELECT d0 FROM b))
      SELECT a.user_id AS u1, c.user_id AS u2,
        CAST(sum((a.cents - c.cents) * (a.cents - c.cents)) AS BIGINT) AS dist2
      FROM dense a JOIN dense c ON a.idx = c.idx AND a.user_id < c.user_id
      GROUP BY 1, 2
      HAVING sum((a.cents - c.cents) * (a.cents - c.cents)) <= 3200000000
      ORDER BY u1, u2"""))

  val all: Seq[Q] = Seq(qSeriesPairs)
}
