package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-event analytics over the events table (SURVEY.md §2 B12–B13):
  * funnel conversion and cohort retention — the two product-analytics
  * queries every event-warehouse user runs, expressed as plain shuffles
  * on `user_id` (no corpus-wide window anywhere).
  *
  * Reference anchor: the reference's event processing is the kvraft op
  * log replay (/root/reference/src/kvraft/server.go — per-key ordered
  * application); these rows are the per-USER ordered-application form
  * over the analytics events table.
  */
object Funnels {

  // stage frames are per-surviving-user (tiny vs events) and each is
  // read twice (next stage's join + its own count branch); memoizing
  // them caps events scans at one per step instead of O(steps²)
  private[this] val cache = new graft.ops.PlanCache(capacity = 8)

  /** B12: strict-order funnel. Step 1 users are those with any
    * `steps(0)` event; step i+1 users are those with a `steps(i+1)`
    * event STRICTLY AFTER their earliest completion time of step i
    * (the classic "first-touch" funnel — re-orderings such as a click
    * that precedes the user's first view do not convert).
    *
    * Output: one row per step — (step_idx, step, n_users,
    * frac_of_entry), where frac_of_entry = n_users / step-1 count
    * (NULL when the funnel entry is empty).
    *
    * Scale shape: one filtered aggregation per step — the
    * `event_type = step` predicate pushes into the parquet scan, each
    * stage frame is one row per SURVIVING user (monotonically
    * shrinking), and every stage join is user_id ⋈ user_id on
    * already-aggregated frames, so AQE broadcasts the shrinking side
    * as the funnel narrows. Stage frames are memo-persisted (each is
    * read by the next stage AND its own count branch — without the
    * memo the union's branches recompute earlier stages, O(steps²)
    * event scans), capping events scans at exactly one per step.
    * This beats collecting per-user event arrays (unbounded per-user
    * state) at 100 TB. */
  def funnel(
      events: DataFrame,
      steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    require(steps.nonEmpty && steps.toSet.size == steps.size,
      "steps must be non-empty and distinct")
    val stages = steps.zipWithIndex
      .foldLeft(Vector.empty[DataFrame]) { case (acc, (st, i)) =>
        val f =
          if (i == 0)
            events.filter(col("event_type") === st)
              .groupBy("user_id").agg(min(col("ts")).as("t"))
          else
            events.filter(col("event_type") === st)
              .join(acc.last.select(col("user_id"), col("t").as("prev_t")),
                "user_id")
              .filter(col("ts") > col("prev_t"))
              .groupBy("user_id").agg(min(col("ts")).as("t"))
        acc :+ cache.memo(f)
      }
    val entry = stages.head.agg(count(lit(1)).as("n_entry"))
    val counts = stages.zipWithIndex.map { case (f, i) =>
      f.agg(count(lit(1)).as("n_users"))
        .select(lit((i + 1).toLong).as("step_idx"),
          lit(steps(i)).as("step"), col("n_users"))
    }.reduce(_.union(_))
    counts.crossJoin(broadcast(entry))
      .select(col("step_idx"), col("step"), col("n_users"),
        when(col("n_entry") === 0L, lit(null).cast("double"))
          .otherwise(col("n_users").cast("double") /
            col("n_entry").cast("double")).as("frac_of_entry"))
      .orderBy("step_idx")
  }

  private def sqlFunnel(steps: Seq[String]): String = {
    val ctes = steps.zipWithIndex.map { case (st, i) =>
      if (i == 0)
        s"""s1 AS (SELECT user_id, min(ts) AS t FROM e
            WHERE event_type = '$st' GROUP BY 1)"""
      else
        s"""s${i + 1} AS (SELECT e.user_id, min(e.ts) AS t
            FROM e JOIN s$i ON e.user_id = s$i.user_id AND e.ts > s$i.t
            WHERE e.event_type = '$st' GROUP BY 1)"""
    }.mkString(",\n      ")
    val unions = steps.zipWithIndex.map { case (st, i) =>
      s"SELECT ${i + 1} AS step_idx, '$st' AS step, count(*) AS n_users FROM s${i + 1}"
    }.mkString("\n        UNION ALL ")
    s"""WITH e AS (SELECT user_id, ts::TIMESTAMP AS ts, event_type FROM events),
      $ctes,
      c AS (
        $unions)
      SELECT CAST(step_idx AS BIGINT) AS step_idx, step,
        CAST(n_users AS BIGINT) AS n_users,
        CASE WHEN (SELECT n_users FROM c WHERE step_idx = 1) = 0 THEN NULL
             ELSE CAST(n_users AS DOUBLE) /
                  (SELECT n_users FROM c WHERE step_idx = 1) END AS frac_of_entry
      FROM c ORDER BY step_idx"""
  }

  val qFunnel: Q = Q(
    "q_funnel",
    (s, d) => funnel(Tables.events(s, d)),
    Some(sqlFunnel(Seq("view", "click", "purchase"))))

  /** B13: weekly cohort retention. Each user's cohort is the
    * calendar-absolute week of their FIRST event (epoch-days div 7 —
    * integer arithmetic, no engine week-truncation semantics);
    * retention offset is whole weeks since that first day
    * (days-since-first div 7). Output: (cohort_wk, offset_wk,
    * n_users) — n_users = distinct users of the cohort active in that
    * offset week; offset 0 is the cohort size.
    *
    * Scale shape: a per-user min aggregation (one shuffle on
    * user_id), a user_id ⋈ user_id join back onto events
    * (co-partitioned with the agg — AQE reuses the exchange), and a
    * distinct-count keyed by (cohort_wk, offset_wk) whose key space
    * is weeks², tiny forever. All integer date math — hash-portable. */
  def retention(events: DataFrame): DataFrame = {
    val days = events.select(col("user_id"), to_date(col("ts")).as("d"))
    val first = days.groupBy("user_id").agg(min(col("d")).as("d0"))
    days.join(first, "user_id")
      .select(
        // FLOOR, not `div`: Spark div truncates toward zero while the
        // oracle's // floors — they diverge on pre-1970 first events
        // (epoch days negative); the double division is exact at
        // day-count magnitudes. offset_wk is >= 0 by construction, so
        // div == floor there.
        expr("CAST(FLOOR(CAST(datediff(d0, DATE'1970-01-01') AS DOUBLE) / 7.0) AS BIGINT)")
          .as("cohort_wk"),
        expr("CAST(datediff(d, d0) div 7 AS BIGINT)").as("offset_wk"),
        col("user_id"))
      .groupBy("cohort_wk", "offset_wk")
      .agg(count_distinct(col("user_id")).as("n_users"))
      .orderBy("cohort_wk", "offset_wk")
  }

  val qRetention: Q = Q(
    "q_retention",
    (s, d) => retention(Tables.events(s, d)),
    Some("""WITH e AS (
        SELECT user_id, CAST(ts::TIMESTAMP AS DATE) AS d FROM events),
      f AS (SELECT user_id, min(d) AS d0 FROM e GROUP BY 1)
      SELECT
        CAST(date_diff('day', DATE '1970-01-01', f.d0) // 7 AS BIGINT) AS cohort_wk,
        CAST(date_diff('day', f.d0, e.d) // 7 AS BIGINT) AS offset_wk,
        count(DISTINCT e.user_id) AS n_users
      FROM e JOIN f USING (user_id)
      GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** B14: first-order Markov transition matrix over event types — for
    * each user's time-ordered stream (ties broken by event_id), count
    * src→dst adjacencies and normalize per src row. The "what happens
    * after an error?" path-analysis query.
    *
    * Scale shape: the lag window shuffles on user_id once (the same
    * partitioning sessionize uses), the count key space is
    * |event_types|² (tiny forever, map-side combinable), and the
    * row-normalizing window runs over that tiny frame — never the
    * corpus. p = n/row-total is one double division of exact longs. */
  def transitions(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val cnt = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("src", lag(col("event_type"), 1).over(w))
      .filter(col("src").isNotNull)
      .groupBy(col("src"), col("event_type").as("dst"))
      .agg(count(lit(1)).as("n"))
    cnt.withColumn("p",
        col("n").cast("double") /
          sum(col("n")).over(Window.partitionBy("src")).cast("double"))
      .orderBy("src", "dst")
  }

  val qTransitions: Q = Q(
    "q_transitions",
    (s, d) => transitions(Tables.events(s, d)),
    Some("""WITH e AS (
        SELECT user_id, ts::TIMESTAMP AS ts, event_id, event_type FROM events),
      pairs AS (SELECT event_type AS dst,
          lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src
        FROM e)
      SELECT src, dst, count(*) AS n,
        CAST(count(*) AS DOUBLE) /
          CAST(sum(count(*)) OVER (PARTITION BY src) AS DOUBLE) AS p
      FROM pairs WHERE src IS NOT NULL
      GROUP BY 1, 2 ORDER BY 1, 2"""))

  val all: Seq[Q] = Seq(qFunnel, qRetention, qTransitions)
}
