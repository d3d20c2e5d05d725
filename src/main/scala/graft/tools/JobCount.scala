package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.AtomicInteger

/** Diagnostic: Spark JOB and STAGE count per registered query. Each job
  * is a driver scheduling round trip; on contended hosts that round
  * trip dominates (BENCH_r04: multi-job queries paid 3-5× vs local
  * while single-pipeline queries reproduced exactly), so job count is
  * the portable cost metric the bench time alone hides. */
object JobCount {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
    })
    // same dev affordance as Bench: SPARK_GRAFT_ONLY=a,b,c restricts
    // the counted set so a loop-shape investigation doesn't pay the
    // whole registry
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val out = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => only.forall(_.contains(q._1)))
      .map { case (n, fn) =>
      jobs.set(0); stages.set(0)
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"[jobcount] $n FAILED: $e") }
      // listener bus is async — give it a beat to drain before reading
      Thread.sleep(150)
      (n, jobs.get(), stages.get())
    }
    out.sortBy(-_._2).foreach { case (n, j, st) =>
      println(f"[jobcount] $n%-28s jobs=$j%3d stages=$st%3d")
    }
    println(s"[jobcount] TOTAL jobs=${out.map(_._2).sum} stages=${out.map(_._3).sum}")
    spark.stop()
  }
}
