package graft.tools

import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicLong

import graft.Tables
import graft.streaming.{StreamEvent, StreamOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

/** Streaming THROUGHPUT bench — the missing perf axis for the
  * `streaming/StreamOps` family (StreamOpsSpec proves batch parity and
  * semantics; this measures events/second under a realistic micro-batch
  * cadence).
  *
  * Protocol, mirroring the batch bench's spirit:
  *  - input is the harness `events` table (sf dir from
  *    `SPARK_GRAFT_SF_DIR`, default sf0.1 = 100k events over 30 days,
  *    1,500 users), replicated `SPARK_GRAFT_STREAM_REPS`× (default 10 →
  *    1M events) by shifting event/user ids per replica — the SAME
  *    growth axis ScaleGen uses: the wall-clock window stays fixed and
  *    the user keyspace grows, which is what a bigger live ingest looks
  *    like (state size is keyed by user, so this scales the state too);
  *  - events are delivered in event-time order in
  *    `SPARK_GRAFT_STREAM_CHUNKS` chunks (default 20), one
  *    `MemoryStream.addData` + `processAllAvailable()` per chunk → one
  *    micro-batch per chunk, watermark advancing monotonically ≈1.5
  *    days per batch. Per-op wall time covers feed + every micro-batch
  *    + a final empty-batch drain, so per-batch scheduling and state
  *    store commit overhead are IN the number (that is the point — a
  *    streaming engine's throughput is dominated by per-batch fixed
  *    cost at this scale, not per-row cost);
  *  - output rows are counted through a foreachBatch counter (the
  *    no-op-sink analog: results materialize, nothing is kept);
  *  - a JIT warm-up pass runs every op on the first chunk only before
  *    anything is timed (fresh checkpoint dirs; warm-up outputs are
  *    discarded).
  *
  * Ops measured (one fresh MemoryStream + checkpoint each):
  *  - windowed_counts  — watermarked sliding-window agg (append)
  *  - session_window   — native session_window agg
  *  - sessionize       — flatMapGroupsWithState gap sessionization
  *  - dedup            — dropDuplicatesWithinWatermark, fed with 10%
  *                       injected duplicate event_ids
  *  - contribution_cap — per-user DP bounding (NoTimeout FMGWS state)
  *  - stream_join      — stream-stream interval join click→purchase
  *
  * Prints ONE JSON line:
  * {"metric":"stream_bench","events":N,"chunks":C,"ops":{name:
  *   {"wall_s":…,"rows_out":…,"events_per_s":…}}}
  */
object StreamBench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_STREAM_REPS", "10").toInt
    val chunks = sys.env.getOrElse("SPARK_GRAFT_STREAM_CHUNKS", "20").toInt
    // SPARK_GRAFT_MASTER='local-cluster[4,8,4096]' (+ SPARK_HOME,
    // SPARK_SCALA_VERSION, SPARK_GRAFT_JARS — see Bench.scala) runs the
    // same protocol against separate executor JVMs: serialized state
    // store I/O and exchanges, the axis local[n] can't test.
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val builder0 = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    val builder1 =
      if (master.startsWith("local-cluster"))
        builder0.config("spark.executor.memory",
          sys.env.getOrElse("SPARK_GRAFT_EXEC_MEM", "3g"))
      else builder0
    val builder = sys.env.get("SPARK_GRAFT_JARS")
      .fold(builder1)(j => builder1.config("spark.jars", j))
    // SPARK_GRAFT_STATE_STORE=rocksdb swaps the state store provider —
    // the large-state backend (state spills off-heap to local RocksDB
    // instead of living in executor heap). At 100 TB-ingest state
    // sizes this is the production choice; the A/B here measures what
    // it costs at SMALL state, where the per-batch commit/snapshot
    // machinery is the whole price.
    val spark = (sys.env.get("SPARK_GRAFT_STATE_STORE") match {
      case Some("rocksdb") => builder.config(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider")
      case _ => builder
    }).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // ts arrives as epoch NANOS long (Tables.events contract) → Timestamp
    val base = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts"), col("value"))
      .collect()
      .map(r => StreamEvent(r.getLong(0), r.getLong(1), r.getString(2),
        new Timestamp(r.getLong(3) / 1000000L), r.getDouble(4)))
    // replicate: fixed window, growing id/user keyspace (see Scaladoc)
    val events: Array[StreamEvent] = (0 until reps).toArray.flatMap { rep =>
      if (rep == 0) base
      else base.map(e => e.copy(
        event_id = e.event_id + rep * 1000000000L,
        user_id = e.user_id + rep * 10000000L))
    }.sortBy(_.ts.getTime)
    val n = events.length
    val chunked: Array[Array[StreamEvent]] =
      events.grouped(math.max(1, (n + chunks - 1) / chunks)).toArray
    // dedup feed: every 10th event re-delivered in the SAME chunk (a
    // dup arriving within the watermark is exactly what the op evicts)
    val dupChunked: Array[Array[StreamEvent]] = chunked.map { c =>
      (c ++ c.zipWithIndex.collect { case (e, i) if i % 10 == 0 => e })
        .sortBy(_.ts.getTime)
    }

    // SPARK_GRAFT_STREAM_MODE=availablenow (round-10 VERDICT #4): the
    // DRAIN protocol — all chunks visible before the query starts, one
    // Trigger.AvailableNow run processes them at the engine's own batch
    // planning (plus the no-data batches that flush watermark-gated
    // state) and self-terminates. This removes the chunked cadence's
    // per-micro-batch fixed cost (~0.4 s each, the 1M-event matrix's
    // known asymptote) and measures what the operator itself can
    // sustain; the chunked default stays the realistic-ingest number.
    //
    // SPARK_GRAFT_STREAM_MODE=availablenow_bounded (round-10 VERDICT
    // #3): the BOUNDED drain — the MemoryStream form above delivers
    // everything as ONE batch (48 GiB OOM at 10M events), because the
    // memory source has no admission control. Production drains don't:
    // the chunks land as parquet FILES and the file source's
    // maxFilesPerTrigger (SPARK_GRAFT_DRAIN_FILES_PER_TRIGGER, default
    // 1 = one chunk per micro-batch) bounds every batch that
    // Trigger.AvailableNow plans — same self-terminating protocol,
    // memory bounded by chunk size + live state. Files carry strictly
    // increasing mtimes in chunk order so the source (latestFirst =
    // false) processes them in event-time order and the watermark
    // stays monotone — the dedup rows_out parity below is enforced in
    // this mode too.
    val streamMode = sys.env.getOrElse("SPARK_GRAFT_STREAM_MODE", "chunked")
    val availableNow = streamMode == "availablenow"
    val boundedDrain = streamMode == "availablenow_bounded"
    val filesPerTrigger =
      sys.env.getOrElse("SPARK_GRAFT_DRAIN_FILES_PER_TRIGGER", "1").toInt

    // SPARK_GRAFT_STATE_PARTS (round-10 VERDICT #2): route every query
    // start through StreamOps.withStateParts — state-store partitions
    // sized to state volume (8 beat 32 on every op at 10M events under
    // the heap store) while the session keeps its full compute
    // parallelism for the non-stateful work. Round-12 VERDICT #4: the
    // DEFAULT is now the provider-aware auto resolution (heap → 8,
    // RocksDB → session default — the lever rule is heap-scoped);
    // an integer pins the count explicitly, and 'session' opts out of
    // any override (the pre-round-11 behavior, kept for A/B runs).
    val statePartsEnv = sys.env.get("SPARK_GRAFT_STATE_PARTS")
    val statePartsMode: String = statePartsEnv.getOrElse("auto")
    def startQ[A](body: => A): A = statePartsMode match {
      case "session" => body
      case "auto" => graft.streaming.StreamOps.withStateParts(spark)(body)
      case n => graft.streaming.StreamOps.withStateParts(spark, n.toInt)(body)
    }
    // the count streaming queries will actually pin at first start
    val effectiveStateParts: Int = statePartsMode match {
      case "session" => cpus.toInt
      case "auto" => graft.streaming.StreamOps.resolveStateParts(spark)
        .getOrElse(cpus.toInt)
      case n => n.toInt
    }

    // bounded-drain feeds: each chunk ONE parquet file in a shared dir
    // (written once, reused by every op that consumes that feed), with
    // mtimes spaced 60 s apart in chunk order. Dirs live under the
    // warehouse root → reclaimed at process exit (round-11 ADVICE: the
    // per-feed dirs leaked gigabytes per 10M run).
    lazy val feedDirs = scala.collection.mutable.Map.empty[String, String]
    def fileFeed(name: String, feed: Array[Array[StreamEvent]]): String =
      feedDirs.getOrElseUpdate(name, {
        val dir = graft.Warehouse.tempDir(s"streamfeed-$name-")
        val t0 = System.currentTimeMillis() - feed.length * 60000L
        feed.zipWithIndex.foreach { case (c, k) =>
          val tmp = graft.Warehouse.tempDir("streamfeed-tmp-")
          spark.createDataset(c.toIndexedSeq)(
              org.apache.spark.sql.Encoders.product[StreamEvent])
            .coalesce(1).write.mode("overwrite").parquet(tmp)
          val part = new java.io.File(tmp).listFiles()
            .find(_.getName.endsWith(".parquet")).get
          val dst = new java.io.File(dir, f"chunk$k%05d.parquet")
          java.nio.file.Files.move(part.toPath, dst.toPath)
          // mtime order is the event-time-order guarantee of the whole
          // bounded-drain protocol (latestFirst=false sorts by mtime):
          // verify the write AND the read-back, and abort loudly if the
          // FS can't hold it — otherwise the watermark can jump and the
          // parity failures that follow would point at the OPERATOR
          // (round-11 ADVICE).
          val want = t0 + k * 60000L
          if (!dst.setLastModified(want) || dst.lastModified() != want)
            sys.error(s"[streambench] cannot establish mtime spacing on " +
              s"$dst (want $want, read back ${dst.lastModified()}) - " +
              "bounded-drain event-time ordering would be unreliable; " +
              "aborting")
          org.apache.commons.io.FileUtils
            .deleteQuietly(new java.io.File(tmp))
        }
        System.err.println(s"[streambench] feed '$name': ${feed.length} " +
          s"files at $dir")
        dir
      })

    /** Runs one op over the named feed; returns (wallSec, rowsOut,
      * eventsIn). `feedName` is EXPLICIT (round-11 ADVICE: inferring it
      * by reference equality meant a future third feed would silently
      * reuse — and drain — the wrong events). */
    def run(feedName: String, feed: Array[Array[StreamEvent]],
        warm: Boolean)(
        mk: DataFrame => DataFrame): (Double, Long, Long) = {
      implicit val sqlCtx = spark.sqlContext
      val out = new AtomicLong(0L)
      val ckpt = graft.Warehouse.tempDir("streambench-ckpt-")
      if (boundedDrain && !warm) {
        // bounded drain: parquet file source + maxFilesPerTrigger.
        // The feed dir is written once per feed (shared across ops
        // and NOT in the timed window — the drain measures the
        // operator, not parquet encoding; the chunked mode's
        // feed-inclusive number remains the ingest-cadence yardstick).
        val dir = fileFeed(feedName, feed)
        val fed = feed.iterator.map(_.length.toLong).sum
        // data-batch counter: the WITNESS that admission control
        // actually bounded the drain (nBatches must be ≥ files /
        // maxFilesPerTrigger; a single giant batch means the limit was
        // ignored and the memory claim is void)
        val nBatches = new AtomicLong(0L)
        val t0 = System.nanoTime()
        val q = startQ(spark.readStream
          .schema(org.apache.spark.sql.Encoders.product[StreamEvent].schema)
          .option("maxFilesPerTrigger", filesPerTrigger)
          .parquet(dir)
          .transform(mk)
          .writeStream
          .outputMode(OutputMode.Append)
          .option("checkpointLocation", ckpt)
          .foreachBatch { (df: DataFrame, _: Long) =>
            nBatches.incrementAndGet()
            out.addAndGet(df.count()); ()
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start())
        try q.awaitTermination() finally q.stop()
        val wall = (System.nanoTime() - t0) / 1e9
        System.err.println(s"[streambench]   drain planned " +
          s"${nBatches.get()} batches over ${feed.length} files " +
          s"(maxFilesPerTrigger=$filesPerTrigger)")
        org.apache.commons.io.FileUtils
          .deleteQuietly(new java.io.File(ckpt))
        return (wall, out.get(), fed)
      }
      val mem = MemoryStream[StreamEvent]
      val use = if (warm) feed.take(1) else feed
      val t0 = System.nanoTime()
      var fed = 0L
      def writer = mk(mem.toDF())
        .writeStream
        .outputMode(OutputMode.Append)
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: DataFrame, _: Long) =>
          out.addAndGet(df.count()); ()
        }
      if (availableNow && !warm) {
        // timed window still covers feed + every batch, same as the
        // chunked protocol (addData is a driver-side batch append)
        use.foreach { c => mem.addData(c.toIndexedSeq); fed += c.length }
        val q = startQ(writer
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start())
        try q.awaitTermination() finally q.stop()
      } else {
        val q: StreamingQuery = startQ(writer.start())
        try {
          use.foreach { c =>
            mem.addData(c.toIndexedSeq)
            fed += c.length
            q.processAllAvailable()
          }
        } finally q.stop()
      }
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.commons.io.FileUtils
        .deleteQuietly(new java.io.File(ckpt))
      (wall, out.get(), fed)
    }

    def toDs(df: DataFrame) = df.as[StreamEvent]

    // each op names its feed EXPLICITLY (name, chunks) — fileFeed keys
    // the on-disk dir by that name, never by object identity
    val mainFeed = "main" -> chunked
    val dupFeed = "dup" -> dupChunked
    val ops: Seq[(String, DataFrame => DataFrame,
        (String, Array[Array[StreamEvent]]))] =
      Seq(
        ("windowed_counts",
          df => StreamOps.windowedTypeCounts(df, "6 hours", "1 hour"),
          mainFeed),
        ("session_window",
          df => StreamOps.sessionWindowStats(df, gap = "30 minutes",
            watermark = "1 hour"),
          mainFeed),
        ("sessionize",
          df => StreamOps.sessionize(toDs(df), gapMs = 30L * 60 * 1000)
            .toDF(),
          mainFeed),
        ("dedup",
          df => StreamOps.dedupEvents(df, watermark = "1 hour"),
          dupFeed),
        ("contribution_cap",
          df => StreamOps.contributionCap(toDs(df)).toDF(),
          mainFeed),
        ("stream_join",
          df => StreamOps.clickToPurchase(
            df.filter(col("event_type") === "click"),
            df.filter(col("event_type") === "purchase"),
            withinSec = 3600L, watermark = "1 hour"),
          mainFeed))

    // SPARK_GRAFT_STREAM_KILL=true (local-cluster only): SIGKILL one
    // executor process mid-stream during each measured op — the
    // streaming face of tools/FaultProbe. The state store must reload
    // from the checkpoint's delta files on the replacement executor and
    // the retried micro-batch must not double-emit; the dedup op's
    // exact rows_out (== distinct event count) is the assertion,
    // ENFORCED below: a double-emit exits non-zero, not just a number.
    val killMidStream =
      sys.env.get("SPARK_GRAFT_STREAM_KILL").contains("true")
    val appId = spark.sparkContext.applicationId
    def executorPids(): Seq[Long] = {
      import scala.sys.process._
      // filter by this app's id (in the executor launch command line as
      // --app-id) so a concurrent Spark app never loses an executor here
      Seq("bash", "-c",
        "ps -eo pid,cmd | grep CoarseGrainedExecutorBackend" +
          s" | grep -- '$appId' | grep -v grep")
        .!!.linesIterator.map(_.trim.split("\\s+")(0).toLong).toSeq
    }
    def withKiller[A](body: => A): A =
      if (!killMidStream) body
      else {
        val killer = new Thread(() => {
          Thread.sleep(
            sys.env.getOrElse("SPARK_GRAFT_KILL_DELAY_MS", "4000").toLong)
          executorPids().sorted.headOption.foreach { pid =>
            System.err.println(s"[streambench] killing executor pid=$pid")
            Runtime.getRuntime.exec(Array("kill", "-9", pid.toString))
              .waitFor()
          }
        })
        killer.setDaemon(true); killer.start()
        val r = body
        killer.join(1000)
        var tries = 0
        while (executorPids().size < 4 && tries < 60) {
          Thread.sleep(500); tries += 1
        }
        r
      }

    // JIT/codegen warm-up: one chunk through every op, discarded
    ops.foreach { case (_, mk, (fname, feed)) =>
      run(fname, feed, warm = true)(mk) }

    val results = ops.map { case (name, mk, (fname, feed)) =>
      val (wall, rows, fed) =
        withKiller { run(fname, feed, warm = false)(mk) }
      System.err.println(f"[streambench] $name%-17s ${wall}%7.2f s  " +
        f"rows_out=$rows%9d  ${fed / wall}%,.0f ev/s")
      name -> (wall, rows, fed)
    }

    // Streaming variance bands (round-12 VERDICT #6): the batch bench
    // self-flags drift against committed per-query bands; the streaming
    // matrix was still single-run-vs-single-run. STREAM_BANDS.json
    // (tools/stream_bands.py over ≥3 same-code runs) carries a per-op
    // [lo,hi] ev/s envelope KEYED BY PROTOCOL (sf, reps, mode, state
    // store, state-parts shape) — a run under any other protocol
    // disables the guard loudly rather than flagging noise.
    val stateStore =
      sys.env.get("SPARK_GRAFT_STATE_STORE").getOrElse("heap")
    val bandsFile = sys.env.getOrElse("SPARK_GRAFT_STREAM_BANDS",
      "STREAM_BANDS.json")
    val bandCtx = Map("sf" -> sfDir.split('/').last,
      "reps" -> reps.toString, "mode" -> streamMode,
      "state_store" -> stateStore, "state_parts" -> statePartsMode)
    val streamBands: Map[String, (Double, Double)] = {
      val path = java.nio.file.Paths.get(bandsFile)
      if (!java.nio.file.Files.exists(path)) {
        if (sys.env.contains("SPARK_GRAFT_STREAM_BANDS"))
          System.err.println(s"[stream-bands] WARNING: " +
            s"SPARK_GRAFT_STREAM_BANDS=$bandsFile does not exist - " +
            "out-of-band guard DISABLED")
        Map.empty
      } else try {
        val txt = new String(
          java.nio.file.Files.readAllBytes(path), "UTF-8")
        def field(k: String): Option[String] =
          (""""""" + k + """":"?([^",}]+)"?""").r
            .findFirstMatchIn(txt).map(_.group(1))
        val mismatched = bandCtx.filter { case (k, v) =>
          !field(k).contains(v) }
        if (mismatched.nonEmpty) {
          System.err.println(s"[stream-bands] WARNING: $bandsFile is " +
            s"for ${bandCtx.keys.map(k => s"$k=${field(k).getOrElse("<none>")}")
              .mkString(",")} but this run is " +
            s"${bandCtx.map { case (k, v) => s"$k=$v" }.mkString(",")} " +
            "- out-of-band guard DISABLED")
          Map.empty
        } else {
          val parsed =
            """"([a-z_]+)":\{"lo":([0-9.]+),"hi":([0-9.]+)\}""".r
              .findAllMatchIn(txt)
              .map(m => m.group(1) ->
                (m.group(2).toDouble, m.group(3).toDouble)).toMap
          if (parsed.isEmpty)
            System.err.println(s"[stream-bands] WARNING: $bandsFile " +
              "parsed to ZERO bands (format drift?) - out-of-band " +
              "guard DISABLED")
          parsed
        }
      } catch { case t: Throwable =>
        System.err.println(s"[stream-bands] WARNING: failed to read " +
          s"$bandsFile (${t.getClass.getSimpleName}: ${t.getMessage}) " +
          "- out-of-band guard DISABLED")
        Map.empty
      }
    }
    val outOfBand = results.flatMap { case (name, (wall, _, fed)) =>
      val evs = fed / wall
      streamBands.get(name).flatMap { case (lo, hi) =>
        // throughput: higher is better — flag a drop below lo/1.3 and
        // a suspicious jump above hi*1.5 (an op that suddenly does no
        // work also "speeds up"; rows_out parity catches most, this
        // catches the rest)
        if (evs < lo / 1.3) Some((name, evs, f"below [$lo%.0f,$hi%.0f]"))
        else if (evs > hi * 1.5)
          Some((name, evs, f"above [$lo%.0f,$hi%.0f]"))
        else None
      }
    }
    if (outOfBand.nonEmpty)
      System.err.println(outOfBand.map { case (k, v, why) =>
        f"$k=$v%.0f ev/s ($why)" }
        .mkString("[stream-out-of-band] ", " ", ""))
    else if (streamBands.nonEmpty)
      System.err.println(s"[stream-bands] all ${results.size} ops " +
        s"inside committed bands ($bandsFile)")

    val opsJson = results.map { case (name, (wall, rows, fed)) =>
      f""""$name":{"wall_s":$wall%.2f,"rows_out":$rows,""" +
        f""""events_per_s":${fed / wall}%.0f}"""
    }.mkString(",")
    val oobJson = outOfBand.map { case (k, v, why) =>
      s""""$k":{"events_per_s":${f"$v%.0f"},"band":"$why"}""" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"stream_bench","events":$n,"chunks":$chunks,""" +
      s""""sf":"${sfDir.split('/').last}","reps":$reps,""" +
      s""""mode":"$streamMode","state_store":"$stateStore",""" +
      s""""state_parts":"$statePartsMode",""" +
      s""""effective_state_parts":$effectiveStateParts,""" +
      s""""banded":${streamBands.nonEmpty},"out_of_band":$oobJson,""" +
      s""""ops":{$opsJson}}""")
    // dedup's feed is the event set with every 10th event re-delivered,
    // so its exact rows_out is n (the distinct event_id count) — the
    // batch-parity invariant of BOTH protocols. Enforced under fault
    // injection (a retried micro-batch that double-emits, or a state
    // store that lost its dup registry, changes the count) and in the
    // availablenow drain (whose different batch boundaries must not
    // change append-mode semantics).
    val dedupBad = (killMidStream || availableNow || boundedDrain) &&
      results.collectFirst {
        case ("dedup", (_, rows, _)) if rows != n.toLong => rows
      }.isDefined
    if (dedupBad) {
      val got = results.collectFirst { case ("dedup", (_, r, _)) => r }.get
      val ctx =
        if (killMidStream) "after mid-stream executor kill"
        else s"in the $streamMode drain (batch boundaries must not " +
          "change append-mode dedup semantics)"
      System.err.println(s"[streambench] FAILURE: dedup rows_out=$got " +
        s"!= distinct event count $n $ctx")
    }
    // sessionize cadence-independence (round 11): with gap-splitting
    // inside fn, the emitted session partition is a pure function of
    // the event SET — so rows_out must equal the driver-computable
    // expectation in EVERY mode (20-chunk cadence, one-batch drain,
    // bounded drain): gap-partition each user's ordered events; a
    // session emits iff a later event closed it (which implies
    // last+gap < maxTs) or the final watermark (= global max ts)
    // passed last+gap. A session ending exactly at maxTs−gap is a
    // </<= boundary tie in the state-store timeout check, so the
    // assertion brackets both counts.
    val sessGapMs = 30L * 60 * 1000
    val maxTs = events.iterator.map(_.ts.getTime).max
    val sessionLasts = events.groupBy(_.user_id).iterator.flatMap {
      case (_, es) =>
        val ts = es.map(_.ts.getTime).sorted
        val ends = scala.collection.mutable.ArrayBuffer(ts.head)
        var last = ts.head
        ts.iterator.drop(1).foreach { t =>
          if (t > last + sessGapMs) ends += t else ends(ends.size - 1) = t
          last = t
        }
        ends
    }.toArray
    val expectLo = sessionLasts.count(_ + sessGapMs < maxTs).toLong
    val expectHi = sessionLasts.count(_ + sessGapMs <= maxTs).toLong
    val sessBad = results.collectFirst {
      case ("sessionize", (_, rows, _))
          if rows < expectLo || rows > expectHi => rows
    }
    sessBad.foreach { got =>
      System.err.println(s"[streambench] FAILURE: sessionize " +
        s"rows_out=$got outside expected [$expectLo,$expectHi] in mode " +
        s"$streamMode (gap sessionization must be micro-batch-cadence " +
        "independent)")
    }
    spark.stop()
    if (dedupBad || sessBad.isDefined) sys.exit(1)
  }
}
