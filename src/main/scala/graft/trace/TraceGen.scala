package graft.trace

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Seeded Scala port of the reference's synthetic trace generator
  * (`Src/data.py:67-175` semantics): a bounded set of TEMPLATE traces is
  * built by matched Request/Response recursion — at each level a process
  * fans out to ≤ `numMaxChild` child tasks, each child emits a Request
  * (caller → callee) on entry and the matching Response (callee →
  * caller) on exit, recursion bounded by `maxDepth`, tasks mapped to
  * "S<n>" servers from a seeded task→server table, the root caller is
  * "user" — then `numProcess` real processes instantiate a template
  * each with fresh per-event times (the reference's re-timing loop:
  * +rand(5,11) per event).
  *
  * Differences from the reference, by design: fully SEEDED (the
  * reference leaves `random` unseeded, so its corpora are one-shot
  * artifacts), and instantiation is DISTRIBUTED — templates are a
  * bounded driver-side array captured in a `flatMap` closure
  * (≤ distinctProcess · 2·Σ numMaxChild^d events), so generating 100k+
  * processes scales out instead of writing a driver-side JSON file.
  * Times are unique per process (per-process base offset) rather than
  * globally sequential; part-1/part-2 semantics only read per-process
  * ORDER, which is identical.
  *
  * Test amenity for StressSpec — not a registered operator. */
object TraceGen {

  final case class LogRow(
      state_from: String,
      state_to: String,
      action: String,
      time: Long,
      process_id: String)

  /** Build the bounded template set on the driver. Each template is the
    * (from, to, action) event sequence of one matched recursion. */
  private[graft] def templates(
      distinctProcess: Int,
      numMaxChild: Int,
      maxDepth: Int,
      nTasks: Int,
      nServers: Int,
      seed: Long): Array[Vector[(String, String, String)]] = {
    val rnd = new scala.util.Random(seed)
    // reference create_tasks: each task lands on a seeded server
    val taskServer = Array.fill(nTasks)(rnd.nextInt(nServers))
    Array.fill(distinctProcess) {
      val buf = Vector.newBuilder[(String, String, String)]
      def recurse(prevServer: String, depth: Int): Unit = {
        val fanout = 1 + rnd.nextInt(numMaxChild)
        for (_ <- 1 to fanout) {
          val server = "S" + taskServer(rnd.nextInt(nTasks))
          buf += ((prevServer, server, "Request"))
          if (depth < maxDepth) recurse(server, depth + 1)
          buf += ((server, prevServer, "Response"))
        }
      }
      recurse("user", 0)
      buf.result()
    }
  }

  /** Generate `numProcess` instantiated processes as a distributed
    * frame with [[TracePipeline.logSchema]] columns. */
  def logs(
      spark: SparkSession,
      distinctProcess: Int,
      numProcess: Int,
      numMaxChild: Int = 2,
      maxDepth: Int = 3,
      nTasks: Int = 100,
      nServers: Int = 1000,
      seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val tmpl = templates(distinctProcess, numMaxChild, maxDepth, nTasks,
      nServers, seed)
    val nTmpl = tmpl.length
    spark.range(numProcess.toLong)
      .repartition(spark.sparkContext.defaultParallelism)
      .as[Long]
      .flatMap { i =>
        val events = tmpl((((seed ^ i) % nTmpl).toInt + nTmpl) % nTmpl)
        val rnd = new scala.util.Random(seed * 1000003L + i)
        // per-process time base keeps events globally unique without a
        // driver-side sequential clock; intra-process order matches the
        // reference's +rand(5,11) re-timing walk
        var t = i * 1000000L
        events.map { case (f, to, a) =>
          t += 5L + rnd.nextInt(7)
          LogRow(f, to, a, t, s"process${i + 1}")
        }
      }
      .toDF()
  }
}
