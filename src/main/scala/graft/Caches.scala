package graft

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Registry for operator-persisted intermediates.
  *
  * Several operators persist a bounded intermediate (shingle frames,
  * quantized projections, LSH pair outputs) that feeds the LAZY result
  * plan they return — so they cannot unpersist before the caller
  * materializes, and long-lived sessions would otherwise accumulate
  * orphaned cache entries (round-5 ADVICE). Operators route every such
  * persist through [[track]]; harness mains (Bench between measured
  * queries, Verify after each dump) and library users call [[drain]]
  * once the returned frame is materialized. Targeted unpersist — not
  * `catalog.clearCache()` — so user-owned caches in the same session
  * are never touched.
  */
object Caches {
  private val reg =
    new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()

  /** Persist `ds` MEMORY_AND_DISK and register it for [[drain]]. */
  private[graft] def track[T](ds: Dataset[T]): Dataset[T] = {
    val p = ds.persist(StorageLevel.MEMORY_AND_DISK)
    reg.add(p)
    p
  }

  /** Unpersist every tracked intermediate (non-blocking). Safe to call
    * at any time: a drained frame lazily recomputes if re-used. */
  def drain(): Unit = {
    var d = reg.poll()
    while (d != null) { d.unpersist(blocking = false); d = reg.poll() }
  }

  /** True if the session's cache manager holds no cached plans —
    * the post-drain invariant CacheHygieneSpec locks. */
  def isEmpty(spark: SparkSession): Boolean =
    org.apache.spark.sql.GraftColumnBridge.cacheManagerIsEmpty(spark)
}
