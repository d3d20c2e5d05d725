package graft.tools
import org.apache.spark.sql.functions._

/** Scratch probe: cost/shape of stage-2 refinement (edit-distance
  * DBSCAN within stage-1 components) at reference-max scale
  * (homogeneity.json) — run before wiring it into StressSpec. */
object Stage2Probe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val TP = graft.trace.TracePipeline
    val t0 = System.nanoTime()
    def mark(l: String): Unit =
      println(f"[probe] $l%-10s ${(System.nanoTime() - t0) / 1e9}%.1f s")
    val logs = TP.readLogJson(spark, "/root/reference/Data/homogeneity.json")
    val procs = TP.depthFeatures(TP.processes(logs))
    val dim = TP.serverClusterDim(spark, TP.serverConnections(
      TP.logsWithDepth(logs, procs)))
    val clogs = TP.clusterLogs(logs, dim).persist()
    val stage1 = TP.elementClusters(spark, TP.processElements(clogs))
      .persist()
    val inCluster = stage1.filter(col("component") >= 0).count()
    mark(s"stage1 ($inCluster clustered)")
    val cprocs = TP.processes(clogs, from = "cluster_from", to = "cluster_to")
    val fine = TP.refineClusters(spark, cprocs, stage1)
    val stats = fine.agg(count(lit(1)),
      sum(when(col("fine_component") >= 0, 1).otherwise(0)),
      countDistinct(when(col("fine_component") >= 0,
        col("fine_component")))).head()
    mark(s"stage2 rows=${stats.getLong(0)} inCluster=${stats.getLong(1)} " +
      s"fineClusters=${stats.getLong(2)}")
    spark.stop()
  }
}
