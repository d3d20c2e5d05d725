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
    * store. Every value derives from md5 (metadata from
    * `md5("meta_<id>")` hex slices, payload bytes from the raw digests
    * of `md5("payload_<id>_<block>")`) — PORTABLE arithmetic that the
    * DuckDB oracle replays bit-for-bit (the d4 SimHash trick), unlike
    * the Java-PRNG stream this replaces. */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).as[Long].map { id =>
      val md = java.security.MessageDigest.getInstance("MD5")
      def hex(s: String): String =
        md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val mh = hex(s"meta_$id")
      val a = java.lang.Long.parseLong(mh.substring(0, 8), 16)
      val b = java.lang.Long.parseLong(mh.substring(8, 16), 16)
      val c = java.lang.Long.parseLong(mh.substring(16, 24), 16)
      val kind = Seq("image", "audio", "video")((id % 3).toInt)
      val len = (256 + a % 768).toInt
      val bytes = new Array[Byte](len)
      var pos = 0
      var k = 0
      while (pos < len) {
        val dg = md.digest(s"payload_${id}_$k".getBytes("UTF-8"))
        val m = math.min(16, len - pos)
        System.arraycopy(dg, 0, bytes, pos, m)
        pos += m; k += 1
      }
      kind match {
        case "image" => MediaRow(id, kind, bytes, (64 + b % 512).toInt,
          (64 + c % 512).toInt, 0, 0L)
        case "audio" => MediaRow(id, kind, bytes, 0, 0,
          Seq(8000, 16000, 44100)((b % 3).toInt), 1000L + c % 9000)
        case _ => MediaRow(id, kind, bytes, 320, 240, 0, 1000L + c % 9000)
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
      // f0 is a FLOAT histogram bin; cast to double BEFORE rounding so
      // the arithmetic is pinned (float→double is exact) and the DuckDB
      // oracle can replay it with an explicit FLOAT division
      .select(col("media_id"), col("kind"), col("n_bytes"),
        round(element_at(col("features"), 1).cast("double"), 4).as("f0"),
        coalesce(col("n_frames"), lit(0L)).as("n_frames"))
      .orderBy("media_id")
  }

  /** DuckDB oracle for [[pipeline]]: replays the md5-derived generator,
    * the image resize truncation, the 16-bin byte histogram's bin 0 (a
    * FLOAT division, cast to double then rounded — matching the Spark
    * side exactly), and the frame-count math, from nothing but `md5()`
    * and `range()` — no parquet input needed. */
  def pipelineOracleSql(n: Int): String =
    s"""WITH ids AS (SELECT range AS id FROM range($n)),
       |meta AS (SELECT id,
       |    ('0x'||substr(md5('meta_'||id),1,8))::BIGINT AS a,
       |    ('0x'||substr(md5('meta_'||id),9,8))::BIGINT AS b,
       |    ('0x'||substr(md5('meta_'||id),17,8))::BIGINT AS c
       |  FROM ids),
       |m2 AS (SELECT id,
       |    CASE CAST(id % 3 AS INT) WHEN 0 THEN 'image'
       |         WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       |    256 + (a % 768) AS len,
       |    64 + (b % 512) AS w, 64 + (c % 512) AS h,
       |    1000 + (c % 9000) AS dur
       |  FROM meta),
       |eff AS (SELECT id, kind, dur,
       |    CASE WHEN kind = 'image' AND greatest(w, h) > 256
       |         THEN greatest(1, CAST(floor(len * (256.0 / greatest(w, h))
       |                               * (256.0 / greatest(w, h))) AS BIGINT))
       |         ELSE len END AS n
       |  FROM m2),
       |bytes AS (SELECT e.id,
       |    ('0x'||substr(md5('payload_'||e.id||'_'||(r.range // 16)),
       |                  1 + CAST(r.range % 16 AS INT) * 2, 2))::INT AS byte
       |  FROM eff e JOIN range(1024) r ON r.range < e.n),
       |hist AS (SELECT id, sum(CASE WHEN byte < 16 THEN 1 ELSE 0 END) AS c0,
       |                count(*) AS cnt
       |         FROM bytes GROUP BY id)
       |SELECT e.id AS media_id, e.kind, e.n AS n_bytes,
       |  round(CAST(CAST(h.c0 AS FLOAT) / CAST(h.cnt AS FLOAT) AS DOUBLE),
       |        4) AS f0,
       |  CASE WHEN e.kind = 'video' THEN e.dur // 500 + 1
       |       ELSE 0 END AS n_frames
       |FROM eff e JOIN hist h USING (id) ORDER BY media_id""".stripMargin
}
