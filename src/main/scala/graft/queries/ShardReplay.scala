package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sharded-KV config replay — the reference's shard-controller data
  * surface re-expressed as batch reconstruction
  * (/root/reference/src/shardctrler/common.go:6-29: a numbered log of
  * Join/Leave/Move ops defines shard→group ownership per config epoch;
  * /root/reference/src/shardkv/server.go routes each key op to the group
  * owning key2shard(key) under the config current at op time).
  *
  * The config log is DERIVED deterministically from the events table
  * (every 97th event_id is a config op; the rest are key ops), so both
  * engines replay the identical history:
  *   - epoch    = rank of the config op by (ts, event_id)
  *   - op       = join / leave / move by (event_id/97) mod 3
  *   - gid      = user_id mod 4 + 1; moved shard = (event_id/97) mod 16
  * Ownership semantics (deterministic round-robin in place of the
  * reference's imperative minimal-movement rebalance — same data shape,
  * SQL-expressible):
  *   - a gid is active at rebalance epoch r iff its latest join/leave op
  *     at epoch ≤ r is a join;
  *   - at each join/leave epoch, shard s belongs to the (s mod n_active)-th
  *     active gid in ascending gid order (gid 0 = unowned when none);
  *   - a move(shard, gid) overrides that shard until the next rebalance;
  *     the latest qualifying move wins;
  *   - key ops route by AS-OF join: the config epoch whose [ts, next ts)
  *     interval covers the op's timestamp (gid 0 before the first config).
  *
  * Scale design: the config log is metadata (tiny by nature) — its
  * single-partition windows and self-joins are driver-scale work, and the
  * finished ownership×interval table BROADCASTS to the key-op stream, so
  * the only big-data operations are one broadcast-hash routing join on
  * shard and one aggregation. The reference's Raft replication of the
  * config is subsumed by lineage, exactly like kvraft in A7.
  */
object ShardReplay {

  private val NShards = 16
  private val NGroups = 4

  /** TEST-HARNESS derivation of a config log from the events corpus
    * (every 97th event_id): lets the driver oracle replay an identical
    * history from the shared tables. A REAL deployment's config log is a
    * separate, tiny table — bounded by operator actions per day, not by
    * data volume — which is what the public API below takes; deriving
    * config ops as a fixed FRACTION of the event stream (as here) would
    * not be metadata-scale at 100 TB. Produces (cts, tie, op, gid,
    * mshard); `tie` breaks equal-timestamp ordering deterministically. */
  def deriveConfigOps(events: DataFrame): DataFrame =
    events.filter(col("event_id") % 97 === 0)
      // one partition up front: every downstream config step (global
      // window, activeness self-join, move lookup) is metadata-scale, so
      // collapsing here trades nothing and saves ~a dozen multi-task
      // micro-stages of scheduling latency
      .repartition(1)
      .select(col("ts").as("cts"), col("event_id").as("tie"),
        expr("event_id div 97").as("k"), col("user_id"))
      .withColumn("op",
        when(col("k") % 3 === 0, lit("join"))
          .when(col("k") % 3 === 1, lit("leave"))
          .otherwise(lit("move")))
      .withColumn("gid", col("user_id") % NGroups + 1)
      .withColumn("mshard", col("k") % NShards)
      .select("cts", "tie", "op", "gid", "mshard")

  /** TEST-HARNESS key-op extraction: everything that is not a config op,
    * keyed by user_id. */
  def deriveKeyOps(events: DataFrame): DataFrame =
    events.filter(col("event_id") % 97 =!= 0)
      .select(col("user_id"), col("ts").as("kts"))

  /** Public API: shard→group ownership per config epoch with validity
    * intervals — (epoch, cts, next_cts, shard, gid). `configOps` is a
    * config LOG frame (cts, tie, op, gid, mshard) — metadata-scale by
    * nature (its windows and self-joins run on one partition by
    * design). */
  def shardOwnership(configOps: DataFrame): DataFrame = {
    val spark = configOps.sparkSession
    val cfg = configOps
      // config is metadata-small: a global-order window (one partition)
      // is the right tool here, not a scale smell
      .withColumn("epoch",
        row_number().over(Window.orderBy(col("cts"), col("tie"))))
      .select("epoch", "cts", "op", "gid", "mshard")
    val jl = cfg.filter(col("op") =!= "move").select("epoch", "gid", "op")
    // latest join/leave verdict per (rebalance epoch, gid)
    val lastjl = jl.select(col("epoch").as("r_epoch"))
      .join(jl.select(col("epoch").as("j_epoch"), col("gid"), col("op")),
        col("j_epoch") <= col("r_epoch"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("r_epoch", "gid").orderBy(col("j_epoch").desc)))
      .filter(col("rn") === 1)
    val active = lastjl.filter(col("op") === "join")
      .withColumn("idx",
        row_number().over(Window.partitionBy("r_epoch").orderBy("gid")))
      .withColumn("n_active",
        count(lit(1)).over(Window.partitionBy("r_epoch")))
      .select("r_epoch", "gid", "idx", "n_active")
    val shards = spark.range(NShards).select(col("id").as("shard"))
    // round-robin assignment at each rebalance epoch
    val rr = active.join(shards,
        col("idx") === pmod(col("shard"), col("n_active")) + 1)
      .select(col("r_epoch"), col("shard"), col("gid").as("rr_gid"))
    val byEpoch = Window.orderBy("epoch")
    val eps = cfg
      .withColumn("r_epoch",
        max(when(col("op") =!= "move", col("epoch")))
          .over(byEpoch.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("next_cts", lead(col("cts"), 1).over(byEpoch))
      .select("epoch", "cts", "next_cts", "r_epoch")
    val moves = cfg.filter(col("op") === "move")
      .select(col("epoch").as("m_epoch"), col("mshard"), col("gid").as("m_gid"))
    // latest move per (epoch, shard) since that epoch's rebalance
    val mv = eps.join(moves,
        col("m_epoch") <= col("epoch") &&
          col("m_epoch") > coalesce(col("r_epoch"), lit(0)))
      .withColumn("rn", row_number().over(
        Window.partitionBy("epoch", "mshard").orderBy(col("m_epoch").desc)))
      .filter(col("rn") === 1)
      .select(col("epoch").as("mv_epoch"), col("mshard").as("mv_shard"),
        col("m_gid"))
    eps.crossJoin(shards)
      .join(mv,
        col("epoch") === col("mv_epoch") && col("shard") === col("mv_shard"),
        "left")
      .join(rr, Seq("r_epoch", "shard"), "left")
      .select(col("epoch"), col("cts"), col("next_cts"), col("shard"),
        coalesce(col("m_gid"), col("rr_gid"), lit(0L)).as("gid"))
  }

  /** Route key ops through an ownership table: per-op (user_id, shard,
    * gid, kts). Works for a BATCH keyOps frame and unchanged for a
    * STREAMING one (stream–static broadcast join — the static ownership
    * side broadcasts to every micro-batch), so the same routing powers
    * q_shard_replay and a live shard router.
    *
    * Routing is the [[graft.ops.AsOfJoin]] kernel: ownership folds to
    * one sorted epoch history per shard and each key op binary-searches
    * it — O(log epochs) per op. The interval theta-join it replaces hash-
    * joined on shard (16 keys) and then evaluated EVERY epoch interval
    * of the shard per op as a residual filter: ops × epochs comparisons,
    * quadratic in history length. Equal-cts epochs resolve to the
    * highest epoch, exactly the empty-interval semantics of the
    * [cts, next_cts) formulation the oracle still runs.
    *
    * `ownership` must carry (shard, cts, next_cts, epoch, gid) — the
    * [[shardOwnership]] shape. `next_cts` is enforced AFTER the as-of
    * match: if the matched epoch's interval has already closed
    * (kts ≥ next_cts — a gap or a retired shard in a hand-built
    * history), the op routes to gid 0, exactly like the interval
    * formulation. On [[shardOwnership]]'s contiguous output the check
    * never fires. One deliberate divergence: OVERLAPPING intervals
    * (impossible from [[shardOwnership]]) duplicated ops under the old
    * left join; the as-of picks the latest-starting one. */
  def routeKeyOps(keyOps: DataFrame, ownership: DataFrame): DataFrame =
    graft.ops.AsOfJoin.asOfJoin(
        keyOps.select(col("user_id"),
          (col("user_id") % NShards).as("shard"), col("kts"),
          unix_micros(col("kts")).as("__kt")),
        ownership.select(col("shard"),
          unix_micros(col("cts")).as("__ct"), col("epoch"), col("gid"),
          unix_micros(col("next_cts")).as("__nct")),
        keys = Seq("shard"), factTime = "__kt", stateTime = "__ct",
        payload = Seq("epoch", "gid", "__nct"))
      .select(col("user_id"), col("shard"),
        coalesce(
          when(col("__nct").isNull || col("__kt") < col("__nct"), col("gid")),
          lit(0L)).as("gid"),
        col("kts"))

  /** Public API: replay key ops through the ownership history — per
    * (gid, shard) routed-op and distinct-key counts. `configOps` as in
    * [[shardOwnership]]; `keyOps` is the BIG side, (user_id, kts), and
    * only ever sees one broadcast hash join and one aggregation. */
  def shardReplay(configOps: DataFrame, keyOps: DataFrame): DataFrame =
    routeKeyOps(keyOps, shardOwnership(configOps))
      .groupBy("gid", "shard")
      .agg(count(lit(1)).as("n_ops"), countDistinct(col("user_id")).as("n_keys"))
      .orderBy("gid", "shard")

  val qShardReplay: Q = Q(
    "q_shard_replay",
    (s, d) => {
      val events = Tables.events(s, d)
      shardReplay(deriveConfigOps(events), deriveKeyOps(events))
    },
    Some(s"""WITH cfg AS (
        SELECT row_number() OVER (ORDER BY ts::TIMESTAMP, event_id) AS epoch,
               ts::TIMESTAMP AS cts,
               CASE (event_id // 97) % 3 WHEN 0 THEN 'join'
                 WHEN 1 THEN 'leave' ELSE 'move' END AS op,
               user_id % $NGroups + 1 AS gid,
               (event_id // 97) % $NShards AS mshard
        FROM events WHERE event_id % 97 = 0),
      jl AS (SELECT epoch, gid, op FROM cfg WHERE op <> 'move'),
      lastjl AS (
        SELECT r.epoch AS r_epoch, j.gid, j.op,
               row_number() OVER (PARTITION BY r.epoch, j.gid
                 ORDER BY j.epoch DESC) AS rn
        FROM jl r JOIN jl j ON j.epoch <= r.epoch),
      active AS (
        SELECT r_epoch, gid,
               row_number() OVER (PARTITION BY r_epoch ORDER BY gid) AS idx,
               count(*) OVER (PARTITION BY r_epoch) AS n_active
        FROM lastjl WHERE rn = 1 AND op = 'join'),
      shards AS (SELECT range AS shard FROM range($NShards)),
      rr AS (
        SELECT a.r_epoch, s.shard, a.gid AS rr_gid
        FROM active a JOIN shards s ON a.idx = (s.shard % a.n_active) + 1),
      eps AS (
        SELECT epoch, cts,
               max(CASE WHEN op <> 'move' THEN epoch END)
                 OVER (ORDER BY epoch ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW) AS r_epoch,
               lead(cts) OVER (ORDER BY epoch) AS next_cts
        FROM cfg),
      mv AS (
        SELECT * FROM (
          SELECT e.epoch, m.mshard AS mv_shard, m.gid AS m_gid,
                 row_number() OVER (PARTITION BY e.epoch, m.mshard
                   ORDER BY m.epoch DESC) AS rn
          FROM eps e JOIN cfg m ON m.op = 'move'
            AND m.epoch <= e.epoch AND m.epoch > coalesce(e.r_epoch, 0)) t
        WHERE rn = 1),
      own AS (
        SELECT e.epoch, e.cts, e.next_cts, s.shard,
               coalesce(mv.m_gid, rr.rr_gid, 0) AS gid
        FROM eps e CROSS JOIN shards s
        LEFT JOIN mv ON mv.epoch = e.epoch AND mv.mv_shard = s.shard
        LEFT JOIN rr ON rr.r_epoch = e.r_epoch AND rr.shard = s.shard),
      keys_r AS (
        SELECT k.user_id, k.user_id % $NShards AS shard,
               coalesce(o.gid, 0) AS gid
        FROM (SELECT user_id, ts::TIMESTAMP AS kts FROM events
              WHERE event_id % 97 <> 0) k
        LEFT JOIN own o ON o.shard = k.user_id % $NShards
          AND k.kts >= o.cts AND (o.next_cts IS NULL OR k.kts < o.next_cts))
      SELECT gid, shard, count(*) AS n_ops,
             count(DISTINCT user_id) AS n_keys
      FROM keys_r GROUP BY gid, shard ORDER BY gid, shard"""))

  val all: Seq[Q] = Seq(qShardReplay)
}
