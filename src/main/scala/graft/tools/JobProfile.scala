package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd,
  SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Diagnostic: per-JOB wall time and call site for one query — shows
  * WHERE a multi-job query spends its time (broadcast-collect jobs,
  * loop rounds, cache materializations), which the single bench number
  * hides. Bench-protocol session (local[$SPARK_GRAFT_CPUS], AQE off,
  * shuffle partitions = cpus). Usage:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.JobProfile <query> [reps]"
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val name = args.headOption.getOrElse("m19_modularity")
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUF", cpus))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val starts =
      new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int)]()
    val done =
      new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.put(j.jobId, (System.nanoTime(),
          Option(j.properties.getProperty("spark.job.description"))
            .orElse(Option(j.properties.getProperty("callSite.short")))
            .getOrElse(""),
          j.stageInfos.size))
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val s = starts.get(j.jobId)
        if (s != null)
          done.add((j.jobId, (System.nanoTime() - s._1) / 1e9, s._2, s._3))
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val dt = (for (a <- si.submissionTime; b <- si.completionTime)
          yield (b - a) / 1e3).getOrElse(-1.0)
        val sm = si.taskMetrics
        println(f"[stageprofile]  stage ${si.stageId}%3d $dt%6.2f s " +
          f"tasks=${si.numTasks}%3d " +
          f"in=${sm.inputMetrics.bytesRead / 1e6}%8.1f MB " +
          f"sr=${sm.shuffleReadMetrics.totalBytesRead / 1e6}%8.1f MB " +
          f"sw=${sm.shuffleWriteMetrics.bytesWritten / 1e6}%8.1f MB  " +
          si.name.take(90))
      }
    })
    val fn = graft.SparkEntry.queries(name)
    // warm at sf0.01 like Bench
    val warm = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.01")
    try fn(spark, warm).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    graft.Caches.drain(spark, blocking = true)
    for (r <- 1 to reps) {
      Thread.sleep(300); done.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      import scala.jdk.CollectionConverters._
      val jobs = done.asScala.toSeq.sortBy(_._1)
      println(f"[jobprofile] $name rep $r total $total%.2f s, ${jobs.size} jobs")
      jobs.foreach { case (id, dt, desc, nst) =>
        println(f"[jobprofile]   job $id%3d $dt%6.3f s  stages=$nst%2d  $desc")
      }
      graft.Caches.drain(spark, blocking = true)
    }
    spark.stop()
  }
}
