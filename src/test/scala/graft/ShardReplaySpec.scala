package graft

/** A8: shard-config replay semantics on a hand-built history — join
  * round-robin, move override, rebalance clearing moves, and pre-config
  * routing to gid 0 (reference: src/shardctrler Join/Leave/Move +
  * src/shardkv key routing).
  */
class ShardReplaySpec extends SparkSpec {

  private def ts(m: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  test("join → round-robin, move override, rebalance clears moves") {
    import spark.implicits._
    // event_id % 97 == 0 → config op with k = event_id/97:
    //   id 0   (k=0, k%3=0): join  gid user%4+1
    //   id 194 (k=2, k%3=2): move  shard k%16=2 → gid user%4+1
    //   id 291 (k=3, k%3=0): join
    val events = Seq(
      (5000L, ts(0), 7L), // key op BEFORE any config → gid 0, shard 7
      (0L, ts(1), 0L), //    epoch 1: join gid 1 → all shards to gid 1
      (1L, ts(2), 5L), // key: shard 5 → gid 1
      (194L, ts(3), 2L), //  epoch 2: move shard 2 → gid 3
      (2L, ts(4), 2L), // key: shard 2 → gid 3 (move override)
      (3L, ts(4), 4L), // key: shard 4 → gid 1 (unmoved)
      (291L, ts(5), 1L), //  epoch 3: join gid 2 → rebalance: even→1, odd→2
      (4L, ts(6), 2L), // key: shard 2 → gid 1 (rebalance cleared the move)
      (5L, ts(6), 5L) //  key: shard 5 → gid 2
    ).toDF("event_id", "ts", "user_id")
    val got = queries.ShardReplay.shardReplay(
      queries.ShardReplay.deriveConfigOps(events), queries.ShardReplay.deriveKeyOps(events))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val want = Set(
      (0L, 7L, 1L, 1L),
      (1L, 2L, 1L, 1L),
      (1L, 4L, 1L, 1L),
      (1L, 5L, 1L, 1L),
      (2L, 5L, 1L, 1L),
      (3L, 2L, 1L, 1L))
    assert(got == want)
  }

  test("routeKeyOps is a stream-static join: a key-op STREAM routes live") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // static ownership from a two-epoch history: epoch 1 join gid 1
    // (all shards -> 1), epoch 2 (t3) move shard 2 -> gid 3
    val events = Seq(
      (0L, ts(1), 0L), (194L, ts(3), 2L)
    ).toDF("event_id", "ts", "user_id")
    val ownership = queries.ShardReplay.shardOwnership(
      queries.ShardReplay.deriveConfigOps(events))
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, java.sql.Timestamp)]
    val routed = queries.ShardReplay.routeKeyOps(
      mem.toDF().toDF("user_id", "kts"), ownership)
    val query = routed.writeStream.format("memory").queryName("route_stream")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append).start()
    try {
      mem.addData((2L, ts(2)), (2L, ts(4)), (5L, ts(4)), (7L, ts(0)))
      query.processAllAvailable()
      val got = spark.table("route_stream")
        .select("user_id", "shard", "gid")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == Set(
        (2L, 2L, 1L), // at t2: epoch 1, shard 2 -> gid 1
        (2L, 2L, 3L), // at t4: after the move, shard 2 -> gid 3
        (5L, 5L, 1L), // unmoved shard stays with gid 1
        (7L, 7L, 0L))) // before any config -> unowned
    } finally query.stop()
  }

  test("leave removes a group from the rotation") {
    import spark.implicits._
    // id 0 join gid 1; id 291 (k=3) join gid 2; id 97 (k=1) leave gid 2
    val events = Seq(
      (0L, ts(1), 0L), //   epoch 1: join gid 1
      (291L, ts(2), 1L), // epoch 2: join gid 2 → even→1, odd→2
      (1L, ts(3), 3L), // key: shard 3 → gid 2
      (97L, ts(4), 1L), //  epoch 3: leave gid 2 → all shards back to gid 1
      (2L, ts(5), 3L) //  key: shard 3 → gid 1
    ).toDF("event_id", "ts", "user_id")
    val got = queries.ShardReplay.shardReplay(
      queries.ShardReplay.deriveConfigOps(events), queries.ShardReplay.deriveKeyOps(events))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == Set((1L, 3L, 1L, 1L), (2L, 3L, 1L, 1L)))
  }
}
