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
    // one representative per persist-tracking family: LSH pair output
    // (Similarity via m3), shingle frames (Dedup d2), quantized
    // projections (a21/a22), activity-cell self-join (m12), DBSCAN
    // reps/pairs/cores/labels (m6)
    for (name <- Seq("d2_ngram_jaccard", "a22_mad_outliers",
        "a21_equidepth", "m3_neighbor_clusters", "m6_dbscan_jaccard")) {
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      assert(!Caches.isEmpty(spark),
        s"$name should have tracked at least one persisted intermediate")
      Caches.drain()
      assert(Caches.isEmpty(spark),
        s"cache entries leaked after $name + drain")
    }
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
