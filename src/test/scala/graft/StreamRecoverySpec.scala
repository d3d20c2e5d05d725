package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.streaming.StreamOps
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Checkpoint-recovery spec — the streaming fault-tolerance axis
  * (batch-side executor loss is exercised by tools/FaultProbe): a
  * streaming query STOPPED mid-stream and RESTARTED from its
  * checkpoint must (a) resume at the committed offset — already-
  * processed input is not reprocessed, so the sink stays
  * exactly-once — and (b) restore its operator STATE, so a duplicate
  * whose original arrived before the restart is still dropped. Both
  * are load-bearing for any long-running ingest: on a real cluster
  * the driver WILL be replaced mid-stream.
  *
  * Protocol: file-source → dedupEvents (dropDuplicatesWithinWatermark
  * state) → parquet streaming sink, `maxFilesPerTrigger=1`. Phase 1
  * processes two input files and stops; phase 2 appends two more
  * files (one planting a cross-restart duplicate, one an in-phase
  * duplicate) and starts a NEW query over the SAME checkpoint + sink.
  */
class StreamRecoverySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("dedup state and source offsets survive a query restart") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-recovery").toFile
    val in = new java.io.File(root, "in").getAbsolutePath
    val out = new java.io.File(root, "out").getAbsolutePath
    val ckpt = new java.io.File(root, "ckpt").getAbsolutePath

    def ev(id: Long, second: Long) =
      (id, id % 7, "click", new Timestamp(second * 1000L), 1.0)
    def writeFile(rows: Seq[(Long, Long, String, Timestamp, Double)]): Unit =
      rows.toDF("event_id", "user_id", "event_type", "ts", "value")
        .coalesce(1).write.mode("append").parquet(in)

    // phase-1 input: ids 0..99 (file A), 100..199 + dup of id 50 (file B)
    writeFile((0L until 100L).map(i => ev(i, 10 + i)))
    writeFile((100L until 200L).map(i => ev(i, 120 + i)) :+ ev(50L, 330))

    val schema = spark.read.parquet(in).schema
    def startQuery() =
      StreamOps.dedupEvents(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(in),
        watermark = "1 hour")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append).start()

    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    val afterPhase1 = spark.read.parquet(out).count()
    assert(afterPhase1 == 200L,
      s"phase 1 must emit 200 distinct events, got $afterPhase1")

    // phase-2 input: id 150's dup (original processed BEFORE the
    // restart — only restored state can drop it), ids 200..299, then
    // an in-phase dup of 250
    writeFile((200L until 300L).map(i => ev(i, 340 + i)) :+ ev(150L, 650))
    writeFile(Seq(ev(250L, 700)))

    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    val result = spark.read.parquet(out)
    val n = result.count()
    assert(n == 300L, s"expected 300 exactly-once rows, got $n " +
      "(reprocessed offsets would duplicate phase-1 rows; lost state " +
      "would leak the cross-restart dup)")
    val dupCounts = result.groupBy("event_id")
      .count().filter(col("count") > 1).count()
    assert(dupCounts == 0L, "no event_id may appear twice in the sink")
    org.apache.commons.io.FileUtils.deleteQuietly(root)
  }
}
