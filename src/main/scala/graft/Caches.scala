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
  * once the returned frame is materialized.
  *
  * The registry is scoped PER SparkSession (round-6 ADVICE): draining
  * one session never unpersists intermediates a query in another
  * session still needs, and a stopped session's entries are reclaimed
  * with the session. Within one session the queue is bounded at
  * [[MaxTracked]] — when a caller never drains, the oldest entry is
  * unpersisted on overflow (it lazily recomputes if still referenced),
  * so the driver never accumulates unbounded strong references.
  *
  * NOT safe under concurrent query execution in one session: a
  * `drain()` racing another in-flight query of the same session can
  * unpersist an intermediate that query still reads (correct results —
  * persisted frames recompute — but the expensive featurization runs
  * twice). Callers multiplexing one session across threads should
  * drain only at their own quiesce points.
  */
object Caches {
  /** Per-session overflow bound: operators track ≤3 frames per query,
    * so 64 in flight means >20 undrained queries — evict the oldest. */
  private val MaxTracked = 64

  private val reg = new java.util.concurrent.ConcurrentHashMap[
    SparkSession, java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]]()

  /** Persist `ds` MEMORY_AND_DISK and register it for [[drain]]. */
  private[graft] def track[T](ds: Dataset[T]): Dataset[T] = {
    val p = ds.persist(StorageLevel.MEMORY_AND_DISK)
    val q = reg.computeIfAbsent(ds.sparkSession,
      _ => new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]())
    q.add(p)
    while (q.size > MaxTracked) {
      val old = q.poll()
      if (old != null) old.unpersist(blocking = false)
    }
    p
  }

  /** Unpersist every intermediate tracked for `spark`. Safe to call at
    * any quiesce point: a drained frame lazily recomputes if re-used. */
  def drain(spark: SparkSession, blocking: Boolean): Unit = {
    val q = reg.remove(spark)
    if (q != null) {
      var d = q.poll()
      while (d != null) { d.unpersist(blocking); d = q.poll() }
    }
  }

  def drain(spark: SparkSession): Unit = drain(spark, blocking = false)

  /** Unpersist every tracked intermediate across ALL sessions
    * (non-blocking) — the harness-main form. */
  def drain(): Unit = {
    val it = reg.keySet().iterator()
    while (it.hasNext) drain(it.next())
  }

  /** True if the session's cache manager holds no cached plans —
    * the post-drain invariant CacheHygieneSpec locks. */
  def isEmpty(spark: SparkSession): Boolean =
    org.apache.spark.sql.GraftColumnBridge.cacheManagerIsEmpty(spark)
}
