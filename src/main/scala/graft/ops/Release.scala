package graft.ops

import org.apache.spark.sql.SparkSession

/** Session-wide cache release — the hygiene pass between independent
  * queries sharing one JVM/session.
  *
  * Several operators legitimately pin block storage past their own
  * call: iterative ops ([[ConnectedComponents]], [[PageRank]],
  * `ScaleOps.prefixSum`) return frames backed by a `localCheckpoint`
  * (lineage is truncated, so those blocks must survive until the
  * consumer's action), and [[PlanCache]] memos persist frames for
  * reuse across calls. In a long-lived session running many unrelated
  * queries those blocks accumulate, squeeze execution memory, and
  * slow everything that follows (observed: 7 unrelated queries >2x
  * slower in a 66-query sweep). Call [[sweep]] once a query's results
  * are fully consumed to return the session to a clean-storage state.
  */
object Release {

  /** Storage currently held: (persisted RDD count, memory bytes,
    * disk bytes). Cheap — reads driver-side block stats only. */
  def held(spark: SparkSession): (Int, Long, Long) = {
    val infos = spark.sparkContext.getRDDStorageInfo
    (infos.length, infos.map(_.memSize).sum, infos.map(_.diskSize).sum)
  }

  /** Unpersist every persisted/checkpointed RDD in the session and
    * drop all [[PlanCache]] memos. Blocking, so storage is verifiably
    * empty on return. Session-WIDE, not library-scoped: Spark's block
    * registry doesn't record who persisted what, so caller-owned
    * `.persist()` frames are released too (recompute-safe — they
    * silently fall back to re-scanning their source). Frames returned
    * by iterative operators are NOT usable after this (their lineage
    * was truncated at the released checkpoint) — sweep only after
    * results are consumed, and not concurrently with another thread's
    * in-flight action. */
  def sweep(spark: SparkSession): Unit = {
    PlanCache.clearAll()
    // Drop Dataset-level cache entries THROUGH the catalog first:
    // unpersisting only the raw RDDs (below) rips the buffers out from
    // under entries still registered in Spark's CacheManager, and a
    // later touch of such a stale entry can fire the recacheByPlan
    // rebuild cascade over other stale entries — observed at the 505k
    // probe as an INTERNAL_ERROR NullPointerException
    // ("SparkPlan.session() is null") inside localCheckpoint when a
    // memo's buildBuffers completed and tried to rebuild a swept
    // sibling. clearCache unpersists AND unregisters, so nothing
    // stale survives for the cascade to find.
    spark.catalog.clearCache()
    // localCheckpoint / raw-RDD persists live below the CacheManager;
    // release them too (blocking, so storage is verifiably empty)
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
  }
}
