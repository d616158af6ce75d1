package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.storage.StorageLevel

/** Small LRU of persisted frames keyed by (session, canonicalized
  * analyzed plan) — the memo behind operators that are called
  * repeatedly over the same input frame ([[graft.queries.Dedup]]'s
  * signature frame, [[graft.queries.Curation]]'s survivor stage).
  *
  * Why not a bare `.persist()` at each call site: every call would pin
  * a NEW cache entry for an identical plan (Spark dedupes nothing
  * across Dataset instances), leaking block storage for the session's
  * lifetime. Keying on the canonicalized plan makes repeat calls over
  * the same corpus share one entry; the LRU bound keeps alternating
  * workloads (two corpora interleaved) from thrashing; entries whose
  * SparkSession has stopped are dropped eagerly so no dead-session
  * plan is pinned for JVM lifetime.
  */
final class PlanCache(capacity: Int) {

  private type Key = (SparkSession, LogicalPlan)
  private[this] val entries =
    scala.collection.mutable.LinkedHashMap.empty[Key, DataFrame]

  /** The persisted memo of `df` (MEMORY_AND_DISK), creating and caching
    * it on first sight of the plan. */
  def memo(df: DataFrame): DataFrame = synchronized {
    val key = (df.sparkSession, df.queryExecution.analyzed.canonicalized)
    entries.filterInPlace { case ((s, _), _) => !s.sparkContext.isStopped }
    entries.remove(key) match {
      case Some(f) =>
        entries.put(key, f) // re-insert at LRU tail
        f
      case None =>
        while (entries.size >= capacity) {
          val oldest = entries.head._1
          entries.remove(oldest).foreach(_.unpersist(blocking = false))
        }
        val f = df.persist(StorageLevel.MEMORY_AND_DISK)
        entries.put(key, f)
        f
    }
  }
}
