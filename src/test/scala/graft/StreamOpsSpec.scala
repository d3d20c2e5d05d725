package graft

import java.sql.Timestamp

import graft.streaming.{StreamEvent, StreamOps}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, explode}
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming specs driven through MemoryStream: watermarked
  * windowed counts and gap-based stateful sessionization. */
class StreamOpsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def ev(id: Long, user: Long, typ: String, second: Long) =
    StreamEvent(id, user, typ, new Timestamp(second * 1000L), 1.0)

  test("windowedTypeCounts: counts land in the right event-time windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamEvent]
    val q = StreamOps.windowedTypeCounts(mem.toDF(), "1 minute", "0 seconds")
      .writeStream.format("memory").queryName("wtc")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(ev(1, 1, "click", 10), ev(2, 1, "click", 20),
        ev(3, 2, "view", 30))
      q.processAllAvailable()
      // advance the watermark far enough to close the first window
      mem.addData(ev(4, 1, "click", 600))
      q.processAllAvailable()
      mem.addData(ev(5, 1, "click", 1200))
      q.processAllAvailable()
      val rows = spark.sql("SELECT event_type, n FROM wtc").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(rows.contains(("click", 2L)), s"got $rows")
      assert(rows.contains(("view", 1L)), s"got $rows")
    } finally q.stop()
  }

  test("sessionWindowStats: events within the gap merge into one session") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamEvent]
    val q = StreamOps.sessionWindowStats(mem.toDF(), gap = "30 seconds")
      .writeStream.format("memory").queryName("swin")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1: 10,25,40 chain (gaps 15s < 30s) → ONE session [10, 70);
      // user 2: isolated event at 12 → its own session [12, 42)
      mem.addData(ev(1, 1, "click", 10), ev(2, 1, "view", 25),
        ev(3, 1, "click", 40), ev(4, 2, "view", 12))
      q.processAllAvailable()
      // push the watermark past both sessions' close so append emits them
      mem.addData(ev(5, 1, "click", 500))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT user_id, n_events, unix_timestamp(s_start) AS st, " +
        "unix_timestamp(s_end) AS en FROM swin").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(rows == Set((1L, 3L, 10L, 70L), (2L, 1L, 12L, 42L)),
        s"got $rows")
    } finally q.stop()
  }

  test("foreachBatchParquetSink: per-batch partitions, idempotent on replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files
      .createTempDirectory("graft_febatch_").toString
    val mem = MemoryStream[StreamEvent]
    val q = StreamOps.foreachBatchParquetSink(mem.toDF(), dir).start()
    try {
      mem.addData(ev(1, 1, "click", 10), ev(2, 2, "view", 20))
      q.processAllAvailable()
      mem.addData(ev(3, 1, "click", 30))
      q.processAllAvailable()
      val out = spark.read.parquet(dir)
      assert(out.count() == 3)
      // two micro-batches → two batch_id partitions, prunable on read
      assert(out.select("batch_id").distinct().count() == 2)
      // replay semantics: re-writing a batch's partition replaces it,
      // never appends (simulate the retry directly)
      Seq(ev(1, 1, "click", 10), ev(2, 2, "view", 20)).toDF()
        .write.mode("overwrite").parquet(s"$dir/batch_id=0")
      assert(spark.read.parquet(dir).count() == 3)
    } finally q.stop()
  }

  test("dedupEvents: duplicate event ids within the watermark are dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamEvent]
    val q = StreamOps.dedupEvents(mem.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(ev(1, 1, "click", 10), ev(1, 1, "click", 10),
        ev(2, 2, "view", 20))
      q.processAllAvailable()
      mem.addData(ev(1, 1, "click", 11)) // dup id, later batch
      q.processAllAvailable()
      val n = spark.sql("SELECT count(*) FROM dedup").head().getLong(0)
      assert(n == 2, s"expected 2 distinct events, got $n")
    } finally q.stop()
  }

  test("asofClickAttribution: purchases carry the latest prior click across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamEvent]
    val q = StreamOps.asofClickAttribution(mem.toDS(), retainMs = 3600_000L)
      .writeStream.format("memory").queryName("asof")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: click@10, purchase@20 (same batch, ordered by event time),
      // and a purchase@5 for user 2 with NO prior click
      mem.addData(ev(1, 1, "click", 10), ev(2, 1, "purchase", 20),
        ev(3, 2, "purchase", 5))
      q.processAllAvailable()
      // batch 2: the click state must survive micro-batch boundaries
      mem.addData(ev(4, 1, "purchase", 40), ev(5, 1, "click", 50),
        ev(6, 1, "purchase", 60))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT purchase_id, click_id FROM asof").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(rows == Map(2L -> 1L, 3L -> -1L, 4L -> 1L, 6L -> 5L), s"got $rows")
    } finally q.stop()
  }

  test("enrich: stream-static broadcast join attaches dimension values") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val mem = MemoryStream[StreamEvent]
    val q = StreamOps.enrich(mem.toDF(), dim, "user_id")
      .select("event_id", "user_id", "tier")
      .writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(ev(1, 1, "click", 10), ev(2, 2, "view", 20),
        ev(3, 9, "error", 30))
      q.processAllAvailable()
      val rows = spark.sql("SELECT user_id, tier FROM enriched")
        .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(rows(1L).contains("gold") && rows(2L).contains("silver"))
      assert(rows(9L).isEmpty, "unknown user keeps null tier (left join)")
    } finally q.stop()
  }

  test("clickToPurchase: stream-stream interval join pairs within the window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[StreamEvent]
    val purchases = MemoryStream[StreamEvent]
    val q = StreamOps.clickToPurchase(clicks.toDF(), purchases.toDF(), 120L)
      .writeStream.format("memory").queryName("c2p")
      .outputMode(OutputMode.Append).start()
    try {
      clicks.addData(ev(1, 1, "click", 10), ev(2, 2, "click", 10))
      purchases.addData(
        ev(100, 1, "purchase", 60),    // within 120s of click 1 → pair
        ev(101, 2, "purchase", 300),   // 290s later → outside window
        ev(102, 3, "purchase", 50))    // no click for user 3
      q.processAllAvailable()
      val rows = spark.sql("SELECT user_id, click_id, purchase_id FROM c2p")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows == Set((1L, 1L, 100L)), s"got $rows")
    } finally q.stop()
  }

  test("clickToPurchase leftOuter: expired unmatched clicks emit nulls") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[StreamEvent]
    val purchases = MemoryStream[StreamEvent]
    val q = StreamOps.clickToPurchase(clicks.toDF(), purchases.toDF(),
        120L, "10 seconds", "leftOuter")
      .writeStream.format("memory").queryName("c2p_lo")
      .outputMode(OutputMode.Append).start()
    try {
      clicks.addData(ev(1, 1, "click", 10), ev(2, 2, "click", 10))
      purchases.addData(ev(100, 1, "purchase", 60))
      q.processAllAvailable()
      // push BOTH watermarks far past click@10s + 120s window + 10s delay
      clicks.addData(ev(8, 9, "click", 2000))
      purchases.addData(ev(9, 9, "purchase", 2000))
      q.processAllAvailable()
      val rows = spark.sql(
          "SELECT user_id, click_id, purchase_id FROM c2p_lo")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
      // user 1 matched; user 2's window expired with no purchase →
      // emitted with null purchase (the row an inner join never shows)
      assert(rows.contains((1L, 1L, 100L)), s"matched pair missing: $rows")
      assert(rows.contains((2L, 2L, -1L)), s"outer row missing: $rows")
    } finally q.stop()
  }

  test("sessionize: sessions close after the gap, path is time-ordered") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamEvent]
    val q = StreamOps.sessionize(mem.toDS(), gapMs = 60000L)
      .writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1: two events 10s apart; user 2: one event — out of order
      // arrival within the batch must not corrupt path order
      mem.addData(ev(2, 1, "view", 20), ev(1, 1, "click", 10),
        ev(3, 2, "signup", 15))
      q.processAllAvailable()
      // push watermark beyond both sessions' (last + gap)
      mem.addData(ev(9, 3, "click", 500))
      q.processAllAvailable()
      mem.addData(ev(10, 3, "click", 1000))
      q.processAllAvailable()
      val rows = spark.sql("SELECT user_id, n_events, path FROM sess")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      val byUser = rows.map(t => t._1 -> t).toMap
      assert(byUser(1L)._2 == 2 && byUser(1L)._3 == "click-view",
        s"user1 session wrong: $rows")
      assert(byUser(2L)._2 == 1 && byUser(2L)._3 == "signup")
    } finally q.stop()
  }

  test("sessionize: output is independent of micro-batch cadence") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // one user, three gap-separated sessions (gap 60s): [10,30],
    // [200,210], [500] — the last stays open (never emitted). The 200s
    // event lands >gap after 30s WITHIN one delivery in the 1-batch
    // run and ACROSS deliveries in the 3-batch run; both cadences must
    // emit the same closed sessions (round-11 drain-vs-chunked parity).
    val feed = Seq(ev(1, 1, "click", 10), ev(2, 1, "view", 30),
      ev(3, 1, "click", 200), ev(4, 1, "view", 210), ev(5, 1, "click", 500))
    def runWith(name: String, batches: Seq[Seq[StreamEvent]]) = {
      val mem = MemoryStream[StreamEvent]
      val q = StreamOps.sessionize(mem.toDS(), gapMs = 60000L)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append).start()
      try {
        batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
        spark.sql(s"SELECT user_id, n_events, path, start_ms, end_ms " +
            s"FROM $name").collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
            r.getLong(3), r.getLong(4))).toSet
      } finally q.stop()
    }
    val oneBatch = runWith("sess_one", Seq(feed))
    val threeBatches = runWith("sess_three",
      Seq(feed.take(2), feed.slice(2, 4), feed.drop(4)))
    val expect = Set(
      (1L, 2, "click-view", 10000L, 30000L),
      (1L, 2, "click-view", 200000L, 210000L))
    assert(oneBatch == expect, s"one-batch sessions wrong: $oneBatch")
    assert(threeBatches == expect,
      s"three-batch sessions wrong: $threeBatches")
  }

  test("packDocs: streamed sequence packing equals the batch x24 assignment") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[graft.streaming.DocTok]
    val q = StreamOps.packDocs(mem.toDS(), seqLen = 10L)
      .writeStream.format("memory").queryName("pack")
      .outputMode(OutputMode.Append).start()
    try {
      // two sources, docs arriving in id order per source, split
      // across micro-batches MID-SEQUENCE for source a
      mem.addData(
        graft.streaming.DocTok(1, "a", 4), graft.streaming.DocTok(2, "a", 7),
        graft.streaming.DocTok(3, "b", 12))
      q.processAllAvailable()
      mem.addData(
        graft.streaming.DocTok(4, "a", 9), graft.streaming.DocTok(5, "b", 5))
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT doc_id, seq_id, seq_offset, crosses FROM pack")
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
      // batch math (seqLen 10): source a cum 0,4,11; source b cum 0,12
      val expect = Map(
        1L -> (0L, 0L, false), // [0,4)
        2L -> (0L, 4L, true),  // [4,11) straddles 10
        4L -> (1L, 1L, false), // [11,20) inside seq 1 — state crossed batches
        3L -> (0L, 0L, true),  // [0,12) straddles 10
        5L -> (1L, 2L, false)) // [12,17)
      assert(got == expect, s"got $got")
    } finally q.stop()
  }

  test("incrementalTypeCounts: versioned MV accumulates; replay is idempotent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_mv_").toString
    val mem = MemoryStream[StreamEvent]
    val q = StreamOps.incrementalTypeCounts(mem.toDF(), dir)
    def snapshot(): Map[String, Long] =
      StreamOps.latestTypeCounts(spark, dir).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    try {
      mem.addData(ev(1, 1, "click", 10), ev(2, 1, "click", 11),
        ev(3, 2, "view", 12))
      q.processAllAvailable()
      assert(snapshot() == Map("click" -> 2L, "view" -> 1L))
      mem.addData(ev(4, 3, "click", 20))
      q.processAllAvailable()
      assert(snapshot() == Map("click" -> 3L, "view" -> 1L))
      // replay batch 1 (failure between write and checkpoint commit):
      // the merge must rebase on the snapshot STRICTLY BEFORE id 1,
      // not on its own half-committed output — totals stay identical
      StreamOps.mergeTypeCounts(
        Seq(ev(4, 3, "click", 20)).toDF(), 1L, dir)
      assert(snapshot() == Map("click" -> 3L, "view" -> 1L),
        "replaying a batch must not double-count")
    } finally q.stop()
  }

  test("curateDocs: duplicate and low-quality docs are dropped in-stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = StreamOps.curateDocs(
        mem.toDF().toDF("doc_id", "ts", "text"), minToks = 3)
      .writeStream.format("memory").queryName("curated")
      .outputMode(OutputMode.Append).start()
    def t(sec: Long) = new Timestamp(sec * 1000L)
    try {
      mem.addData(
        (1L, t(10), "alpha beta gamma delta"),
        (2L, t(11), "alpha beta gamma delta"), // exact dup of 1 → drop
        (3L, t(12), "too short"))              // 2 tokens → drop
      q.processAllAvailable()
      mem.addData(
        (4L, t(20), "alpha beta gamma delta"), // dup across batches → drop
        (5L, t(21), "epsilon zeta eta theta"))
      q.processAllAvailable()
      val kept = spark.sql("SELECT doc_id, n_toks FROM curated")
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(kept == Set((1L, 4), (5L, 4)), s"got $kept")
    } finally q.stop()
  }

  test("countMin: streamed matrix equals the batch matrix cell-for-cell") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (d, w) = (4, 64)
    val batch1 = Seq.fill(30)("apple") ++ Seq.fill(10)("pear") ++
      (1 to 25).map(i => s"rare$i")
    val batch2 = Seq.fill(20)("apple") ++ Seq.fill(5)("fig") ++
      (20 to 45).map(i => s"rare$i")
    val mem = MemoryStream[String]
    val q = StreamOps.countMin(mem.toDS().toDF("tok"), d, w)
      .writeStream.format("memory").queryName("cms")
      .outputMode(OutputMode.Update).start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      // Update mode re-emits a cell each batch it changes; keep the last
      val streamed = spark.sql("SELECT r, c, count FROM cms").collect()
        .map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2)))
        .groupBy(_._1).map { case (k, vs) => k -> vs.last._2 }
      val batchMat = (batch1 ++ batch2).toDF("tok")
        .select(explode(graft.functions.cmsCells(col("tok"), d, w))
          .as("cell"))
        .groupBy(col("cell.r"), col("cell.c")).count().collect()
        .map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
      assert(streamed == batchMat,
        s"stream/batch matrices differ: ${streamed.size} vs ${batchMat.size} cells")
      // state is the matrix: never more than d*w cells
      assert(streamed.size <= d * w)
      // probe through the streamed matrix: one-sided overestimate
      def probe(tok: String): Long =
        Seq(tok).toDF("tok")
          .select(explode(graft.functions.cmsCells(col("tok"), d, w))
            .as("cell"))
          .select(col("cell.r"), col("cell.c")).collect()
          .map(r => streamed((r.getInt(0), r.getLong(1)))).min
      assert(probe("apple") >= 50 && probe("pear") >= 10 &&
        probe("fig") >= 5)
    } finally q.stop()
  }

  test("kmvDistinct: streamed merge equals the batch sketch, state bounded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val k = 16
    // deterministic 48-bit hashes, same construction as x10
    def h(tok: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(0, 12), 16)
    }
    val batch1 = (1 to 10).map(i => ("a", h(s"t$i"))) ++
      (1 to 40).map(i => ("b", h(s"u$i")))
    val batch2 = (5 to 15).map(i => ("a", h(s"t$i"))) ++
      (30 to 80).map(i => ("b", h(s"u$i")))
    val mem = MemoryStream[(String, Long)]
    val q = StreamOps.kmvDistinct(mem.toDS(), k)
      .writeStream.format("memory").queryName("kmv")
      .outputMode(OutputMode.Update).start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      // memory sink in Update mode appends each emission; take the last
      // estimate per key (streams emit one row per key per batch seen)
      val last = spark.sql("SELECT key, n_kept, est_distinct FROM kmv")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
        .groupBy(_._1).map { case (key, rs) => key -> rs.last }
      // batch replay of the same sketch over all rows seen
      def batchSketch(rows: Seq[Long]): (Int, Double) = {
        val m = rows.distinct.sorted.take(k)
        val est = if (m.size < k) m.size.toDouble
          else (m.size - 1) * 281474976710656.0 / m.last
        (m.size, math.round(est * 100) / 100.0)
      }
      val all = batch1 ++ batch2
      for (key <- Seq("a", "b")) {
        val (en, ee) = batchSketch(all.filter(_._1 == key).map(_._2))
        assert(last(key)._2 == en && last(key)._3 == ee,
          s"$key: stream ${last(key)} != batch ($en, $ee)")
      }
      // under k → exact; over k → the estimator path with bounded state
      assert(last("a")._2 == 15 && last("a")._3 == 15.0)
      assert(last("b")._2 == k, "key b must have saturated the sketch")
      val truthB = (batch1 ++ batch2).filter(_._1 == "b")
        .map(_._2).distinct.size.toDouble
      assert(math.abs(last("b")._3 - truthB) / truthB < 0.8,
        s"b: est ${last("b")._3} vs exact $truthB beyond 3σ at k=16")
    } finally q.stop()
  }

  test("weightedSampleStream: reservoir converges to the batch x31 sample") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val k = 3
    val docsAll = Seq(
      (1L, "s1", 5L), (2L, "s1", 50L), (3L, "s1", 500L), (4L, "s1", 1L),
      (5L, "s1", 80L), (6L, "s2", 10L), (7L, "s2", 10L), (8L, "s2", 10L),
      (9L, "s2", 300L))
    val mem = MemoryStream[graft.streaming.DocTok]
    val q = StreamOps.weightedSampleStream(mem.toDS(), k)
      .writeStream.format("memory").queryName("aes")
      .outputMode(OutputMode.Update).start()
    try {
      // split mid-stratum: both sources receive docs in BOTH batches,
      // in an order unrelated to the A-ES key order
      def tok(t: (Long, String, Long)) =
        graft.streaming.DocTok(t._1, t._2, t._3)
      mem.addData(docsAll.take(4).map(tok): _*)
      q.processAllAvailable()
      mem.addData(docsAll.drop(4).map(tok): _*)
      q.processAllAvailable()
      // memory sink in Update mode appends each emission; the final
      // sample per source is its LAST ≤k rows (ranks re-emitted whole)
      val rows = spark.sql("SELECT source, rk, doc_id, w FROM aes")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      // each emission is rk = 1..n in row order, so the final sample
      // per source starts at the LAST rk=1 row of its group
      val lastEmission = rows.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
        rs.drop(rs.lastIndexWhere(_._2 == 1L))
      }.toSet
      val batch = graft.ops.TextAnalysis.weightedSample(
          docsAll.toDF("doc_id", "source", "w"), k)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(lastEmission == batch,
        s"stream $lastEmission\n!= batch $batch")
    } finally q.stop()
  }

  test("heavyHitters: MG guarantee holds across micro-batch splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val k = 4
    val mem = MemoryStream[(String, String)]
    val q = StreamOps.heavyHitters(mem.toDS(), k)
      .writeStream.format("memory").queryName("hh")
      .outputMode(OutputMode.Update).start()
    // skewed shard-s stream: "hot" 40x, "warm" 12x, 48 singleton
    // tokens interleaved deterministically; n = 100, n/(k+1) = 20 →
    // hot MUST survive with count ≥ 40 − 20, warm (12 ≤ 20) may drop
    val toks = {
      val rnd = new scala.util.Random(7)
      rnd.shuffle(
        List.fill(40)("hot") ++ List.fill(12)("warm") ++
          (0 until 48).map(i => s"u$i").toList)
    }
    try {
      // split mid-stream so counters must persist across batches
      mem.addData(toks.take(37).map("s" -> _): _*)
      q.processAllAvailable()
      // Update-mode memory sink APPENDS each emission; remember where
      // batch 1's rows end so the final emission is the tail slice
      val n1 = spark.table("hh").count().toInt
      mem.addData(toks.drop(37).map("s" -> _): _*)
      q.processAllAvailable()
      val fin = spark.sql("SELECT tok, cnt_lower FROM hh")
        .collect().map(r => (r.getString(0), r.getLong(1)))
        .drop(n1).toMap
      val exact = toks.groupBy(identity).map { case (t, l) =>
        t -> l.size.toLong }
      val n = toks.size
      val slack = n / (k + 1)
      assert(fin.contains("hot"),
        s"hot (freq 40 > n/(k+1) = $slack) must survive: $fin")
      // every surviving counter is a LOWER bound within slack of truth
      fin.foreach { case (t, c) =>
        assert(c <= exact(t), s"$t overcounted: $c > ${exact(t)}")
        assert(c >= exact(t) - slack,
          s"$t undercounted beyond the MG bound: $c < ${exact(t)} - $slack")
      }
      assert(fin.size <= k, s"state exceeded k counters: $fin")
    } finally q.stop()
  }

  test("ingestDedup: stored-index probe, within-batch CC, index grows " +
      "across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files
      .createTempDirectory("graft_ingest_").toString
    val (idxDir, shDir, outDir) = (s"$base/idx", s"$base/sh", s"$base/out")
    StreamOps.seedDedupIndex(Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text"), idxDir, shDir)
    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = StreamOps.ingestDedup(
      mem.toDF().toDF("doc_id", "ts", "text"), idxDir, shDir, outDir)
      .start()
    try {
      val t = new Timestamp(0L)
      // 10 = near-copy of seed doc 1 (appended token, J≈0.89);
      // 11 = fresh; 12 = near-copy of 11 ARRIVING IN THE SAME BATCH
      mem.addData(
        (10L, t, "alpha beta gamma delta epsilon zeta eta theta iota " +
          "kappa extra"),
        (11L, t, "red orange yellow green blue indigo violet pink " +
          "brown black"),
        (12L, t, "red orange yellow green blue indigo violet pink " +
          "brown black white"))
      q.processAllAvailable()
      // 20 = near-copy of 11 — a BATCH-0 survivor, so this probes the
      // grown index, not the seed; 21 = fresh
      mem.addData(
        (20L, t, "red orange yellow green blue indigo violet pink " +
          "brown black grey"),
        (21L, t, "lion tiger bear wolf fox deer hawk owl crow swan"))
      q.processAllAvailable()
      val out = spark.read.parquet(outDir)
        .select("doc_id", "status", "keeper").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(out == Set(
        (10L, "dup_existing", 1L), (11L, "kept", 11L),
        (12L, "dup_new", 11L),
        (20L, "dup_existing", 11L), (21L, "kept", 21L)), s"got $out")
      // index = seed docs + per-batch survivors, never the dups
      val eids = spark.read.parquet(idxDir).select("eid").distinct()
        .as[Long].collect().toSet
      assert(eids == Set(1L, 2L, 11L, 21L), s"index holds $eids")
    } finally q.stop()
  }

  test("ingestAnn: probes see only the PRIOR index, cells grow per batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files
      .createTempDirectory("graft_ingestann_").toString
    val (centDir, cellsDir, outDir) =
      (s"$base/cent", s"$base/cells", s"$base/out")
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"))
    // seed: ids 0-299; batches carry 300-399 then 400-498 plus a
    // planted EXACT COPY of vector 300's embedding at id 9000 — its
    // top stored neighbor must be 300 at cosine exactly 1.0, which
    // pins that batch 1 probes an index already grown by batch 0.
    StreamOps.seedAnnIndex(emb.filter(col("vec_id") < 300), centDir,
      cellsDir)
    val rows = emb.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val b0 = rows.filter(r => r._1 >= 300 && r._1 < 400)
    val b1 = rows.filter(r => r._1 >= 400 && r._1 < 499) :+
      (9000L, rows.find(_._1 == 300L).get._2)
    val mem = MemoryStream[(Long, Array[Float])]
    val q = StreamOps.ingestAnn(
      mem.toDF().toDF("vec_id", "embedding"), centDir, cellsDir, outDir)
      .start()
    try {
      mem.addData(b0.toIndexedSeq); q.processAllAvailable()
      mem.addData(b1.toIndexedSeq); q.processAllAvailable()
      val out = spark.read.parquet(outDir)
        .select(col("batch_id"), col("qid"), col("rn"), col("nbr"),
          col("sim")).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4)))
      // batch-0 probes only ever match the seed; batch-1 probes match
      // seed + batch-0 survivors, never batch-mates
      assert(out.nonEmpty, "no probe output")
      out.filter(_._1 == 0).foreach { o =>
        assert(o._4 < 300L, s"batch-0 probe matched non-seed: $o") }
      out.filter(_._1 == 1).foreach { o =>
        assert(o._4 < 400L, s"batch-1 probe matched a batch-mate: $o") }
      val planted = out.filter(o => o._2 == 9000L && o._3 == 1L)
      assert(planted.length == 1 && planted.head._4 == 300L &&
        planted.head._5 == 1.0,
        s"planted copy's top neighbor should be (300, 1.0): " +
          s"${planted.toSeq}")
      // the index holds seed + both batches exactly once each
      val ids = spark.read.parquet(cellsDir).select("vec_id")
        .as[Long].collect().sorted
      assert(ids.length == 500 && ids.distinct.length == 500 &&
        ids.last == 9000L, s"index holds ${ids.length} ids")
    } finally q.stop()
  }

  test("annotationConsensus: quorum emit matches the batch vote, split-invariant") {
    import spark.implicits._
    import graft.streaming.{AnnRow, ConsensusOut}
    def run(batches: Seq[Seq[AnnRow]], name: String): Map[Long, (String, Long, Boolean)] = {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[AnnRow]
      val q = StreamOps.annotationConsensus(mem.toDS(), quorum = 5)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append).start()
      try {
        batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
        spark.sql(s"SELECT doc_id, maj_lbl, n_agree, correct FROM $name")
          .collect()
          .map(r => r.getLong(0) ->
            (r.getString(1), r.getLong(2), r.getBoolean(3))).toMap
      } finally q.stop()
    }
    // doc 1: 3 "xx" vs 2 "en" → majority flips from truth;
    // doc 2: unanimous; doc 3: 4-1 toward truth
    def a(d: Long, lang: String, lbl: String) = AnnRow(d, lang, "s", lbl)
    val all =
      Seq(a(1, "en", "xx"), a(1, "en", "xx"), a(1, "en", "en"),
        a(1, "en", "en"), a(1, "en", "xx")) ++
      Seq.fill(5)(a(2, "en", "en")) ++
      (Seq.fill(4)(a(3, "de", "de")) :+ a(3, "de", "xx"))
    val expect = Map(
      1L -> ("xx", 3L, false),
      2L -> ("en", 5L, true),
      3L -> ("de", 4L, true))
    // one batch vs a split that severs every doc's annotations
    // mid-tally — keyed state must carry partial counts across
    val whole = run(Seq(all), "consensus_a")
    val split = run(Seq(all.take(4), all.slice(4, 9), all.drop(9)),
      "consensus_b")
    assert(whole == expect, s"whole-batch run: $whole")
    assert(split == expect, s"split run: $split")
  }

  test("contributionCap: accepted set equals the batch x48 keep, " +
      "counter carries across batches") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // 3 users × 15 events: values span negative (clip to 0), mid, and
    // >$50 (clip to 5000 cents); ids unique across users
    val fixture = for {
      u <- 1L to 3L; i <- 0L until 15L
    } yield StreamEvent(u * 100 + i, u,
      if (i % 2 == 0) "click" else "purchase",
      new Timestamp(1000L * i), i match {
        case 0 => -3.25
        case 1 => 99.995
        case k => k * 7.77
      })
    // batch truth: x48's exact keep+clip expressions
    val w = Window.partitionBy("user_id")
      .orderBy(conv(substring(md5(col("event_id").cast("string")),
        1, 8), 16, 10).cast("long"), col("event_id"))
    val kept = fixture.toDF()
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
      .withColumn("cents", expr("cast(round(value * 100) as bigint)"))
      .withColumn("clipped",
        expr("least(greatest(cast(round(value * 100) as bigint), 0L)," +
          " 5000L)"))
      .select("event_id", "cents", "clipped").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    def run(batches: Seq[Seq[StreamEvent]], name: String)
        : Map[Long, (Long, Long)] = {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[StreamEvent]
      val q = StreamOps.contributionCap(mem.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append).start()
      try {
        batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
        spark.sql(s"SELECT event_id, cents, clipped FROM $name " +
            "WHERE accepted").collect()
          .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      } finally q.stop()
    }
    // one batch: the in-batch rank sort reproduces the batch keep
    val whole = run(Seq(fixture), "cap_whole")
    assert(whole == kept,
      s"whole: extra=${whole.keySet.diff(kept.keySet)} " +
        s"missing=${kept.keySet.diff(whole.keySet)}")
    // rank-ordered split: the per-user counter must carry so the
    // SAME events are accepted across micro-batch boundaries
    val ranked = fixture.sortBy(e =>
      (e.user_id,
        java.lang.Long.parseLong(java.security.MessageDigest
          .getInstance("MD5").digest(e.event_id.toString.getBytes)
          .take(4).map("%02x".format(_)).mkString, 16),
        e.event_id))
    val split = run(Seq(ranked.take(10), ranked.slice(10, 30),
      ranked.drop(30)), "cap_split")
    assert(split == kept,
      s"split: extra=${split.keySet.diff(kept.keySet)} " +
        s"missing=${kept.keySet.diff(split.keySet)}")
  }

  test("AnnIndex lifecycle: append-only drift degrades recall, the " +
      "trigger fires, retrain recovers it and equals a from-scratch build") {
    import spark.implicits._
    import graft.streaming.AnnIndex
    implicit val sqlCtx = spark.sqlContext
    val root = graft.Warehouse.tempDir("annidx_spec_")
    val outDir = graft.Warehouse.tempDir("annidx_out_")

    // Drift geometry (deterministic): the SEED corpus lives in dims
    // 0-7 (8 tight clusters), so seed-trained centroids span only
    // those dims. APPENDED vectors live in novel dims 8-31 (24
    // orthogonal group directions, group = id % 24 — the TRUE
    // neighborhood) plus a small scrambler 0.05·e_h, h = pseudo-random
    // in 0-7 — the only component a FROZEN centroid can see. Frozen
    // cell assignment is therefore keyed by h, i.e. random w.r.t. the
    // true groups: a probe-2 scan sees ~2/8 of a query's siblings and
    // recall@3 collapses. Retraining over the merged corpus gives the
    // novel dims their own centroids and recall recovers — the exact
    // failure-and-refresh cycle of a real retrieval store under
    // distribution shift.
    def seedVec(id: Long): Array[Float] = {
      val a = Array.fill(64)(0f)
      a((id % 8).toInt) = 1f
      for (d <- 0 until 8) a(d) += 0.01f * ((id * 7 + d) % 5)
      a
    }
    def appVec(id: Long): Array[Float] = {
      val a = Array.fill(64)(0f)
      a(8 + (id % 24).toInt) = 1f
      // scrambler: h depends on the MEMBER index (id/24), not just the
      // group — same-group siblings get different h, so frozen cells
      // (which can only see dims 0-7) scatter every true neighborhood
      val h = (((id / 24) * 5 + id % 24) % 8).toInt
      a(h) = 0.3f
      for (d <- 32 until 40) a(d) = 0.002f * ((id * 13 + d) % 7)
      a
    }
    val seedIds = (0L until 320L)
    val batches: Seq[Seq[(Long, Array[Float])]] = (0 until 3).map { b =>
      (0 until 256).map { i =>
        val id = 1000L + b * 256 + i
        (id, appVec(id))
      }
    }
    AnnIndex.seed(seedIds.map(id => (id, seedVec(id)))
      .toDF("vec_id", "embedding"), root)
    assert(AnnIndex.latestVersion(root) == 0)

    // 24 drifted queries, one per group (batch-0 members)
    val queries = (0 until 24).map(g => 1000L + g)
    def queryFrame = graft.ops.Ann.normed(
      queries.map(id => (id, appVec(id))).toDF("vec_id", "embedding"))
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        col("nrm").as("qn"))
    def recallAt3(): Double = {
      val got = AnnIndex.probe(spark, root, queryFrame)
        .select("qid", "nbr").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val corpus = AnnIndex.corpus(spark, root)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("qid")
        .orderBy(col("sim").desc, col("vec_id"))
      val exact = queryFrame.crossJoin(corpus)
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("sim", org.apache.spark.sql.functions.round(
          graft.ops.Ann.simFromNorms(col("qv"), col("v"), col("qn"),
            col("nrm")), 4))
        .withColumn("rn",
          org.apache.spark.sql.functions.row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("qid"), col("vec_id").as("nbr")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(exact).size.toDouble / exact.size
    }

    val mem = MemoryStream[(Long, Array[Float])]
    val q = AnnIndex.ingest(mem.toDF().toDF("vec_id", "embedding"),
      root, outDir).start()
    try {
      mem.addData(batches(0)); q.processAllAvailable()
      // 256/320 = 0.8 appended — under the 1.0 trigger: no retrain
      val st0 = AnnIndex.stats(spark, root)
      assert(st0.version == 0 && st0.appendedFrac < 1.0, st0.toString)
      assert(AnnIndex.maybeRetrain(spark, root,
        maxAppendedFrac = 1.0, maxImbalance = Double.MaxValue).isEmpty)
      mem.addData(batches(1)); q.processAllAvailable()
      val st1 = AnnIndex.stats(spark, root)
      assert(st1.appendedFrac >= 1.0, st1.toString)
      // drift has done its damage: frozen cells scatter true groups
      val recallBefore = recallAt3()
      assert(recallBefore <= 0.7,
        f"drift geometry should degrade frozen-centroid recall, got " +
          f"$recallBefore%.2f")
      // trigger fires past the threshold; version bumps
      val bumped = AnnIndex.maybeRetrain(spark, root,
        maxAppendedFrac = 1.0, maxImbalance = Double.MaxValue)
      assert(bumped.contains(1), s"trigger should retrain to v=1: $bumped")
      assert(AnnIndex.latestVersion(root) == 1)
      val recallAfter = recallAt3()
      assert(recallAfter >= recallBefore + 0.15 && recallAfter >= 0.6,
        f"retrain must recover recall: before=$recallBefore%.2f " +
          f"after=$recallAfter%.2f")
      // the retrained index IS a from-scratch n12 build over the
      // merged corpus: row-identical probe output
      val mergedEmb = (seedIds.map(id => (id, seedVec(id))) ++
        batches(0) ++ batches(1)).toDF("vec_id", "embedding")
      val mv = graft.ops.Ann.normed(mergedEmb)
      val trained = graft.ops.Ann.lloydStep(mv,
        graft.ops.Ann.lloydStep(mv, graft.ops.Ann.seedCentroids(mv)))
      val scratch = graft.ops.Ann.probeStored(queryFrame, trained,
        graft.ops.Ann.assignCells(mv, trained)).collect().toSeq
      val stored = AnnIndex.probe(spark, root, queryFrame)
        .collect().toSeq
      assert(stored == scratch,
        s"retrained probe diverges from from-scratch build: " +
          s"${stored.size} vs ${scratch.size} rows")
      // ingest continues against the NEW version (merged_through guard
      // admits batch 2 > merged_through 1)
      mem.addData(batches(2)); q.processAllAvailable()
      val st2 = AnnIndex.stats(spark, root)
      assert(st2.version == 1 && st2.appended == 256 &&
        st2.seeded == 320 + 512, st2.toString)
      val ids = AnnIndex.corpus(spark, root).select("vec_id")
        .as[Long].collect()
      assert(ids.length == 320 + 768 && ids.distinct.length == ids.length,
        s"corpus holds ${ids.length} ids after retrain + ingest")
    } finally q.stop()
  }
}
