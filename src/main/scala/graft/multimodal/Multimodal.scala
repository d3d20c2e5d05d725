package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media asset: opaque bytes + typed metadata. `kind` ∈
  * {image, audio, video}; metadata fields are nullable per kind. */
final case class MediaRow(
    media_id: Long,
    kind: String,
    bytes: Array[Byte],
    width: Int,
    height: Int,
    sample_rate: Int,
    duration_ms: Long)

/** Extracted feature vector for one asset. */
final case class MediaFeatures(
    media_id: Long,
    kind: String,
    n_bytes: Long,
    features: Array[Float])

/** One sampled video frame. */
final case class FrameRow(
    media_id: Long,
    frame_idx: Int,
    ts_ms: Long)

/** Multimodal-column plumbing for a training-data pipeline: image/audio/
  * video as opaque `binary` columns with typed metadata, plus
  * decode / feature-extract / resize / frame-sample operators.
  *
  * The actual codec calls are STUBBED (no image/audio libraries in this
  * container) behind [[decodeStub]] — a deterministic fake with the same
  * shape a real decoder would have. Everything around it — schema,
  * Dataset typing, per-partition batching, partition sizing, explode
  * shape — is real and tested (MultimodalSpec).
  *
  * Scale posture: media bytes never pass through a shuffle wider than
  * needed — feature extraction is mapPartitions (narrow), frame sampling
  * is a flatMap (narrow), and downstream joins happen on the small
  * feature/frame tables, not the blob table. On a real cluster the blob
  * column stays in parquet with `spark.sql.files.maxPartitionBytes`
  * sized so one task holds a bounded number of assets.
  */
object Multimodal {

  /** Deterministic synthetic media table — stands in for a parquet blob
    * store; payload bytes are a seeded PRNG stream per id. */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).as[Long].map { id =>
      val rnd = new scala.util.Random(id * 7919L + 17L)
      val kind = Seq("image", "audio", "video")((id % 3).toInt)
      val len = 256 + rnd.nextInt(768)
      val bytes = Array.fill[Byte](len)(rnd.nextInt(256).toByte)
      kind match {
        case "image" => MediaRow(id, kind, bytes, 64 + rnd.nextInt(512),
          64 + rnd.nextInt(512), 0, 0L)
        case "audio" => MediaRow(id, kind, bytes, 0, 0,
          Seq(8000, 16000, 44100)(rnd.nextInt(3)), 1000L + rnd.nextInt(9000))
        case _ => MediaRow(id, kind, bytes, 320, 240, 0,
          1000L + rnd.nextInt(9000))
      }
    }
  }

  /** STUB decode + feature extraction. A real implementation would
    * decode `bytes` with an image/audio codec here and run a feature
    * model; this deterministic fake emits a 16-bin normalized byte
    * histogram so the downstream plumbing (schema, batching, joins) is
    * exercised with realistic shapes. Runs as mapPartitions so a real
    * decoder could amortize per-batch model setup exactly here. */
  def decodeStub(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real impl: val decoder = Codec.open() once per partition
      it.map { m =>
        val hist = new Array[Float](16)
        var i = 0
        while (i < m.bytes.length) {
          hist((m.bytes(i) & 0xff) / 16) += 1f
          i += 1
        }
        val total = math.max(1, m.bytes.length).toFloat
        var j = 0
        while (j < 16) { hist(j) /= total; j += 1 }
        MediaFeatures(m.media_id, m.kind, m.bytes.length.toLong, hist)
      }
    }
  }

  /** STUB resize: metadata transform with byte passthrough shape — a
    * real implementation would re-encode; the fake scales dimensions
    * and truncates bytes proportionally (deterministic). Images only;
    * other kinds pass through unchanged. */
  def resizeStub(media: Dataset[MediaRow], maxSide: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { m =>
      if (m.kind != "image" || math.max(m.width, m.height) <= maxSide) m
      else {
        val scale = maxSide.toDouble / math.max(m.width, m.height)
        val nw = math.max(1, (m.width * scale).toInt)
        val nh = math.max(1, (m.height * scale).toInt)
        val nBytes = math.max(1, (m.bytes.length * scale * scale).toInt)
        m.copy(bytes = m.bytes.take(nBytes), width = nw, height = nh)
      }
    }
  }

  /** Frame sampling: one row per sampled frame at `everyMs` intervals —
    * pure metadata math (a real pipeline decodes the frame lazily from
    * the blob given ts_ms). Narrow flatMap; no shuffle. */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      (0L to m.duration_ms by everyMs).zipWithIndex.map { case (ts, idx) =>
        FrameRow(m.media_id, idx, ts)
      }
    }
  }

  /** End-to-end demo frame: features joined with frame counts —
    * the registered rows-only query. */
  def pipeline(spark: SparkSession, n: Int): DataFrame = {
    val media = syntheticMedia(spark, n)
    val feats = decodeStub(resizeStub(media, 256))
    val frames = sampleFrames(media, 500L)
      .groupBy("media_id").agg(count(lit(1)).as("n_frames"))
    feats.toDF()
      .join(frames, Seq("media_id"), "left")
      .select(col("media_id"), col("kind"), col("n_bytes"),
        round(element_at(col("features"), 1), 4).as("f0"),
        coalesce(col("n_frames"), lit(0L)).as("n_frames"))
      .orderBy("media_id")
  }
}
