package graft

import org.scalatest.funsuite.AnyFunSuite

/** Locks the round-5 ADVICE fix: operators that persist intermediates
  * feeding their lazy result register them in [[Caches]], and a single
  * `Caches.drain()` after materialization leaves the session's cache
  * manager EMPTY — repeated operator calls in one long-lived session
  * (Bench runs 130 queries up to 3×) accumulate nothing.
  */
class CacheHygieneSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("persisting operators drain to an empty cache manager") {
    // isolate from earlier suites in the shared session: drain tracked
    // frames AND clear user-level caches other specs legitimately made
    // (e.g. the S9 cache test)
    Caches.drain()
    spark.catalog.clearCache()
    assert(Caches.isEmpty(spark), "pre-condition: cache manager empty")
    // one representative per REMAINING persist-tracking family (round
    // 13 converted the multi-consumer frames to eager localCheckpoints,
    // which the cache manager does not see): shingle frames (Dedup d2),
    // embedding near-dup vecs (d5), the oriented-edge frame (m11), the
    // BT edges/wins frames (x37), the n10 input projection
    for (name <- Seq("d2_ngram_jaccard", "d5_embedding_neardup",
        "m11_triangles", "x37_bt_rank", "n10_power_iter")) {
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      assert(!Caches.isEmpty(spark),
        s"$name should have tracked at least one persisted intermediate")
      Caches.drain()
      assert(Caches.isEmpty(spark),
        s"cache entries leaked after $name + drain")
    }
  }

  test("registry is scoped per SparkSession (round-6 ADVICE)") {
    Caches.drain()
    spark.catalog.clearCache()
    val other = spark.newSession()
    // track one frame in each session — DIFFERENT plans, because the
    // shared CacheManager dedupes identical canonicalized plans across
    // sessions (two sessions caching the same plan share one entry,
    // and per-session drain scoping cannot — and should not — split it)
    val a = graft.ops.Dedup.ngramJaccardPairs(spark, sfDir, 0.8)
    a.count()
    // (minhashJoin's base became an eager checkpoint in round 13 — use
    // an operator that still registers a tracked persist in `other`)
    val b = graft.SparkEntry.queries("n10_power_iter")(other, sfDir)
    b.count()
    // newSession() SHARES the cache manager (SharedState), so isEmpty
    // sees both sessions' persists — the scoping property under test
    // is that draining ONE session leaves the OTHER's intermediates
    // cached (round-6 ADVICE: a JVM-global drain() unpersisted frames
    // a concurrent query in another session still needed)
    assert(!Caches.isEmpty(spark))
    Caches.drain(spark, blocking = true)
    assert(!Caches.isEmpty(spark),
      "drain(spark) reached across into the other session's registry")
    Caches.drain(other, blocking = true)
    assert(Caches.isEmpty(spark), "full drain should empty shared state")
  }

  test("drained frames recompute transparently on re-use") {
    Caches.drain()
    spark.catalog.clearCache() // same isolation as above
    val df = graft.ops.Dedup.ngramJaccardPairs(spark, sfDir, 0.8)
    val n1 = df.count()
    Caches.drain()
    // the same lazy plan still evaluates after its persist was dropped
    assert(df.count() == n1)
    Caches.drain()
    assert(Caches.isEmpty(spark))
  }
}
