package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Executor-loss fault-tolerance probe — the "1000-executor cluster"
  * property none of the perf matrices exercise: on a real cluster
  * executors DIE mid-query, and a plan is only scale-ready if it
  * completes (tasks rescheduled, shuffle/cache blocks recomputed from
  * lineage) with an IDENTICAL result. local[32] cannot test this (one
  * JVM); `local-cluster` can — each executor is a separate OS process
  * this probe can kill.
  *
  * Protocol:
  *  1. run the probe queries once undisturbed → baseline result hash
  *     (`sha1(collected sorted rows)`), in THIS session;
  *  2. re-run each query with a killer thread that waits until the
  *     query is mid-flight (fixed delay into the run) and `kill -9`s
  *     one CoarseGrainedExecutorBackend process — the standalone
  *     worker restarts a replacement, Spark retries the dead
  *     executor's tasks;
  *  3. assert the perturbed run completes and its hash equals the
  *     baseline.
  *
  * Queries chosen to hold in-flight state of every fragile kind:
  * multi-round iterative shuffle (m13 pagerank), persisted
  * intermediates (m19's tracked edge cache — cached blocks on the
  * killed executor must recompute), and a wide exploded exchange
  * (d15). Determinism of every registered query (seeded, tie-broken)
  * is what makes the hash-equality assertion valid.
  *
  * Run (requires the local-cluster env, see Bench.scala):
  *   SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
  *   SPARK_GRAFT_JARS=target/scala-2.13/big_dataspark_2.13-0.1.0.jar \
  *   sbt "runMain graft.tools.FaultProbe"
  * Prints one JSON line: {"metric":"fault_probe","results":{q:
  *   {"baseline_s":…,"killed_s":…,"match":true,"killed_pid":N}}}
  */
object FaultProbe {

  private def executorPids(appId: String): Seq[Long] = {
    import scala.sys.process._
    // CoarseGrainedExecutorBackend is the executor main class; the
    // probe's own driver/worker JVMs don't match it. Filter by THIS
    // app's id (it rides in the executor launch command as --app-id)
    // so a concurrent Spark application on the host can never lose an
    // executor to this probe.
    Seq("bash", "-c",
      "ps -eo pid,cmd | grep CoarseGrainedExecutorBackend" +
        s" | grep -- '$appId' | grep -v grep")
      .!!.linesIterator
      .map(_.trim.split("\\s+")(0).toLong).toSeq
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER",
      "local-cluster[4,8,4096]")
    val killDelayMs =
      sys.env.getOrElse("SPARK_GRAFT_KILL_DELAY_MS", "1500").toLong
    val builder = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.executor.memory",
        sys.env.getOrElse("SPARK_GRAFT_EXEC_MEM", "3g"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    val spark = sys.env.get("SPARK_GRAFT_JARS")
      .fold(builder)(j => builder.config("spark.jars", j))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val queries: Seq[String] = sys.env.get("SPARK_GRAFT_FAULT_QUERIES")
      .map(_.split(",").toSeq)
      .getOrElse(Seq("m13_pagerank", "m19_modularity", "d15_prefix_filter"))

    val appId = spark.sparkContext.applicationId
    // executorRemoved observations per measured run: the validity
    // witness that the kill landed INSIDE the run. A query finishing
    // before killDelayMs would otherwise record killed_pid>0 +
    // match=true and report fault tolerance as exercised when the kill
    // actually landed between queries. The listener records each
    // event's own removal TIMESTAMP (epoch ms, stamped by the
    // scheduler at removal, not at async listener delivery), so each
    // query checks for a removal inside ITS [start, end] wall-clock
    // window — a global counter would let a late-posting removal from
    // the previous query satisfy the next one's witness (round-10
    // ADVICE).
    val removedTimes =
      new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onExecutorRemoved(
            e: org.apache.spark.scheduler.SparkListenerExecutorRemoved)
            : Unit = { removedTimes.add(e.time); () }
      })

    def resultHash(name: String): (String, Double) = {
      val t0 = System.nanoTime()
      val rows = graft.SparkEntry.queries(name)(spark, sfDir)
        .collect().map(_.toString).sorted
      val wall = (System.nanoTime() - t0) / 1e9
      val md = java.security.MessageDigest.getInstance("SHA-1")
      rows.foreach(r => md.update(r.getBytes("UTF-8")))
      graft.Caches.drain()
      (md.digest().map("%02x".format(_)).mkString, wall)
    }

    // warm: JIT + executor registration settled before any timing/kill
    queries.foreach { q =>
      graft.SparkEntry.queries(q)(spark, sfDir).write
        .format("noop").mode("overwrite").save()
      graft.Caches.drain()
    }

    val results = queries.map { q =>
      val (h0, w0) = resultHash(q)
      // killer thread: wait until mid-flight, then SIGKILL one executor
      @volatile var killed: Long = -1L
      val killer = new Thread(() => {
        Thread.sleep(killDelayMs)
        executorPids(appId).sorted.headOption.foreach { pid =>
          killed = pid
          Runtime.getRuntime.exec(Array("kill", "-9", pid.toString)).waitFor()
        }
      })
      killer.setDaemon(true)
      killer.start()
      val runStartMs = System.currentTimeMillis()
      val (h1, w1) = resultHash(q)
      val runEndMs = System.currentTimeMillis()
      killer.join(1000)
      def removalInWindow: Boolean = {
        val it = removedTimes.iterator()
        var found = false
        while (!found && it.hasNext) {
          val t = it.next()
          found = t >= runStartMs && t <= runEndMs
        }
        found
      }
      // listener delivery is async — give the removal a moment to post
      var lTries = 0
      while (!removalInWindow && lTries < 20) {
        Thread.sleep(250); lTries += 1
      }
      // kill landed inside the run ⇔ the scheduler stamped an executor
      // removal within THIS run's window AND the measured wall actually
      // spanned the kill delay
      val landed = removalInWindow && w1 * 1000 > killDelayMs
      // wait for the replacement executor so the NEXT query starts at
      // full strength (standalone worker relaunches within ~seconds)
      var tries = 0
      while (executorPids(appId).size < 4 && tries < 60) {
        Thread.sleep(500); tries += 1
      }
      System.err.println(f"[fault] $q%-18s baseline=$w0%6.2f s  " +
        f"killed-run=$w1%6.2f s  pid_killed=$killed  landed=$landed  " +
        f"match=${h0 == h1}")
      q -> (w0, w1, h0 == h1, killed, landed)
    }

    val json = results.map { case (q, (w0, w1, ok, pid, landed)) =>
      f""""$q":{"baseline_s":$w0%.2f,"killed_s":$w1%.2f,""" +
        s""""match":$ok,"killed_pid":$pid,"kill_landed":$landed}"""
    }.mkString(",")
    println(s"""{"metric":"fault_probe","sf":"${sfDir.split('/').last}",""" +
      s""""results":{$json}}""")
    val allOk = results.forall(_._2._3) && results.forall(_._2._4 > 0) &&
      results.forall(_._2._5)
    if (!allOk)
      System.err.println("[fault] FAILURE: mismatch, no kill, or the " +
        "kill did not land inside the measured run")
    spark.stop()
    if (!allOk) sys.exit(1)
  }
}
