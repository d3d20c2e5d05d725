package graft.tools
import org.apache.spark.sql.functions._
object StressProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val TP = graft.trace.TracePipeline
    val logs = TP.readLogJson(spark, "/root/reference/Data/homogeneity.json")
    val procs = TP.depthFeatures(TP.processes(logs))
    val conns = TP.serverConnections(TP.logsWithDepth(logs, procs))
      .persist()
    println(s"[probe] servers=${conns.count()}")
    for (th <- Seq(0.05, 0.3, 0.5, 0.7)) {
      val t0 = System.nanoTime()
      val dim = TP.serverClusterDim(spark, conns, th)
      val n = dim.select("cluster_id").distinct().count()
      val groups = TP.equalProcesses(TP.clusterLogs(logs, dim))
      val ng = groups.count()
      println(f"[probe] th=$th clusters=$n groups=$ng ${(System.nanoTime()-t0)/1e9}%.1f s")
    }
    spark.stop()
  }
}
