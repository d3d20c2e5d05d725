package graft

import graft.trace.{TracePipeline => TP}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Reference-native stress scale: the `homogeneity.json` preset
  * (`Src/data.py:164-175` — 14,264 events, 1,000 processes built from
  * ~100 distinct shapes, 5,852 distinct server names) is the largest
  * committed dataset and the one shape that exercises the LSH server
  * clustering beyond toy cardinality. The toy goldens prove exact
  * values; this spec proves the pipeline holds up structurally and in
  * bounded time at the reference's own maximum scale. */
class StressSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("part1 + stage-1 part2 complete on homogeneity.json (5,852 servers)") {
    val t0 = System.nanoTime()
    val logs = TP.readLogJson(spark, "/root/reference/Data/homogeneity.json")
    assert(logs.count() == 14264)

    val (groups, dedup) = TP.part1(spark, logs)
    val g = groups.select(col("group_processes_id"),
      size(col("equal_processes")).as("n")).collect()
    val nGroups = g.length
    val nMembers = g.map(_.getInt(1).toLong).sum
    // every process lands in exactly one group. On THIS preset the
    // honest result is 1,000 singleton groups: homogeneity reuses
    // process SHAPES but gives each process distinct server names, and
    // at the reference's 0.05 Jaccard threshold those servers stay in
    // separate clusters, so cluster-space euler strings stay distinct
    // (measured: 5,337 clusters of 5,851 servers — the clustering DOES
    // merge the 514 servers with identical connection sets).
    assert(nMembers == 1000L, s"member total $nMembers")
    assert(nGroups == 1000, s"unexpected grouping: $nGroups")
    assert(dedup.count() > 0)

    // stage-1 part 2 (jaccard DBSCAN over cluster-space element sets)
    // on the same run — the reference's approximate clustering entry
    val dim = TP.serverClusterDim(spark, TP.serverConnections(
      TP.logsWithDepth(logs, TP.depthFeatures(TP.processes(logs)))))
    val nClusters = dim.select("cluster_id").distinct().count()
    assert(nClusters > 1 && nClusters < 5851,
      s"server clustering degenerate: $nClusters clusters")
    val stage1 = TP.elementClusters(spark,
      TP.processElements(TP.clusterLogs(logs, dim)))
    val comps = stage1.agg(
      count(lit(1)), sum(when(col("component") >= 0, 1).otherwise(0))).head()
    assert(comps.getLong(0) == 1000L)
    assert(comps.getLong(1) > 0L, "stage-1 DBSCAN found no clusters")

    val secs = (System.nanoTime() - t0) / 1e9
    info(f"homogeneity stress: $nGroups groups, $nClusters clusters, $secs%.1f s")
    // wall-clock is machine-dependent (CI load alone can blow a fixed
    // bound while the pipeline is perfectly healthy) — the structural
    // assertions above are the hard gate; the timing check is opt-in
    if (sys.env.contains("GRAFT_STRESS_TIME_BOUND"))
      assert(secs < 300, f"stress run too slow: $secs%.1f s")
  }
}
