package graft

import graft.multimodal.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal spec: schema/typing, REAL image decode (PNG round-trip,
  * dimension agreement, pixel-exact features), REAL audio decode (WAV
  * round-trip, rate/duration agreement, sample-exact features), REAL
  * video demux (y4m round-trip, per-frame luma features), real
  * nearest-neighbor resize and resample, frame-sample explode shape. */
class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("syntheticMedia: deterministic, all kinds, bounded payloads") {
    val a = Multimodal.syntheticMedia(spark, 30).collect().sortBy(_.media_id)
    val b = Multimodal.syntheticMedia(spark, 30).collect().sortBy(_.media_id)
    assert(a.map(_.bytes.toSeq).toSeq == b.map(_.bytes.toSeq).toSeq)
    assert(a.map(_.kind).toSet == Set("image", "audio", "video"))
    // every payload is a genuine container: y4m for video, PNG for
    // images, RIFF/WAV for audio
    a.filter(_.kind == "video").foreach(m =>
      assert(new String(m.bytes.take(9), "US-ASCII") == "YUV4MPEG2",
        s"video ${m.media_id} payload is not a y4m stream"))
    a.filter(_.kind == "image").foreach { m =>
      val sig = m.bytes.take(4).map(_ & 0xff)
      assert(sig.sameElements(Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt)),
        s"image ${m.media_id} payload is not a PNG")
    }
    a.filter(_.kind == "audio").foreach { m =>
      assert(new String(m.bytes.take(4), "US-ASCII") == "RIFF",
        s"audio ${m.media_id} payload is not a WAV")
    }
  }

  test("audio decode is real: rate and duration match, samples round-trip") {
    val auds = Multimodal.syntheticMedia(spark, 30).collect()
      .filter(_.kind == "audio")
    assert(auds.nonEmpty)
    auds.foreach { m =>
      val (pcm, rate) = Multimodal.decodeWav(m.bytes)
      assert(rate == m.sample_rate,
        s"decoded rate $rate != metadata ${m.sample_rate}")
      assert(m.duration_ms == pcm.length * 1000L / rate,
        s"metadata duration inconsistent with true frame count")
      // WAV 8-bit PCM is byte-transparent: the decoded sample stream
      // is exactly the md5-derived stream the generator drew
      val md = java.security.MessageDigest.getInstance("MD5")
      val dg = md.digest(s"payload_${m.media_id}_0".getBytes("UTF-8"))
      assert(pcm.take(16).toSeq == dg.toSeq,
        s"audio ${m.media_id} samples diverge from generator stream")
    }
  }

  test("resampleAudio: real decode, NN index map, re-encode") {
    import spark.implicits._
    // a 44.1k ramp through the same codec path
    val pcm = Array.tabulate(4410)(i => (i % 251).toByte)
    val src = Seq(multimodal.MediaRow(3L, "audio",
      Multimodal.encodeWav(pcm, 44100), 0, 0, 44100, 100L)).toDS()
    val out = Multimodal.resampleAudio(src, 8000).collect().head
    assert(out.sample_rate == 8000)
    val (rpcm, rrate) = Multimodal.decodeWav(out.bytes)
    assert(rrate == 8000)
    assert(rpcm.length == 4410L * 8000 / 44100)
    // nearest-neighbor with integer index map: out(i) = in(i*rate/target)
    for (i <- Seq(0, rpcm.length / 2, rpcm.length - 1))
      assert(rpcm(i) == pcm((i.toLong * 44100 / 8000).toInt),
        s"sample $i mismatch")
    // at-or-below-target audio and non-audio pass through untouched
    val media = Multimodal.syntheticMedia(spark, 9)
    val same = Multimodal.resampleAudio(media, 44100).collect()
      .sortBy(_.media_id).zip(media.collect().sortBy(_.media_id))
    same.foreach { case (r, o) => assert(r.bytes.toSeq == o.bytes.toSeq) }
  }

  test("image decode is real: dimensions match metadata, pixels round-trip") {
    val imgs = Multimodal.syntheticMedia(spark, 30).collect()
      .filter(_.kind == "image")
    assert(imgs.nonEmpty)
    imgs.foreach { m =>
      val (px, w, h) = Multimodal.decodeGray(m.bytes)
      assert(w == m.width && h == m.height,
        s"decoded ${w}x$h != metadata ${m.width}x${m.height}")
      assert(px.length == w * h)
      // PNG is lossless: the decoded pixel stream is exactly the
      // md5-derived stream the generator drew (spot-check block 0)
      val md = java.security.MessageDigest.getInstance("MD5")
      val dg = md.digest(s"payload_${m.media_id}_0".getBytes("UTF-8"))
      assert(px.take(16).toSeq == dg.take(math.min(16, px.length)).toSeq,
        s"image ${m.media_id} pixels diverge from generator stream")
    }
  }

  test("extractFeatures: 16-dim normalized histogram; image n_bytes=pixels") {
    val media = Multimodal.syntheticMedia(spark, 20)
    val byId = media.collect().map(m => m.media_id -> m).toMap
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == 20)
    feats.foreach { f =>
      assert(f.features.length == 16)
      assert(math.abs(f.features.sum - 1.0f) < 1e-3f,
        s"histogram of ${f.media_id} not normalized")
      val m = byId(f.media_id)
      f.kind match {
        case "image" => assert(f.n_bytes == m.width.toLong * m.height)
        case "audio" =>
          // decoded sample count, not the WAV container size
          assert(f.n_bytes == Multimodal.decodeWav(m.bytes)._1.length.toLong)
          assert(f.n_bytes < m.bytes.length.toLong)
        case _ =>
          // decoded luma count (w·h·frames), not the container size
          assert(f.n_bytes == m.width.toLong * m.height *
            (m.duration_ms / 1000))
          assert(f.n_bytes < m.bytes.length.toLong)
      }
    }
  }

  test("video demux is real: dims/frames match metadata, luma round-trips") {
    val vids = Multimodal.syntheticMedia(spark, 30).collect()
      .filter(_.kind == "video")
    assert(vids.nonEmpty)
    vids.foreach { m =>
      val (luma, w, h, frames) = Multimodal.decodeY4m(m.bytes)
      assert(w == m.width && h == m.height,
        s"demuxed ${w}x$h != metadata ${m.width}x${m.height}")
      assert(m.duration_ms == frames * 1000L,
        "metadata duration inconsistent with true frame count at 1 fps")
      assert(luma.length == w * h * frames)
      // mono y4m planes are raw: the demuxed luma stream is exactly
      // the md5-derived stream the generator drew
      val md = java.security.MessageDigest.getInstance("MD5")
      val dg = md.digest(s"payload_${m.media_id}_0".getBytes("UTF-8"))
      assert(luma.take(16).toSeq == dg.toSeq,
        s"video ${m.media_id} luma diverges from generator stream")
    }
    // malformed streams are rejected, not misread
    val good = vids.head.bytes
    intercept[IllegalArgumentException] {
      Multimodal.decodeY4m(good.dropRight(3)) // truncated final plane
    }
    intercept[IllegalArgumentException] {
      Multimodal.decodeY4m("YUV4MPEG2 W4 H4 F1:1 C420\nFRAME\n"
        .getBytes("US-ASCII") ++ new Array[Byte](24)) // chroma planes
    }
  }

  test("frameFeatures: real per-frame decode with exact integer mean luma") {
    val media = Multimodal.syntheticMedia(spark, 30)
    val vids = media.collect().filter(_.kind == "video")
    val rows = Multimodal.frameFeatures(media).collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    assert(rows.keySet == vids.map(_.media_id).toSet)
    vids.foreach { m =>
      val (luma, w, h, frames) = Multimodal.decodeY4m(m.bytes)
      val fs = rows(m.media_id)
      assert(fs.length == frames)
      fs.foreach { case (_, idx, ts, milli) =>
        assert(ts == idx * (m.duration_ms / frames))
        val plane = luma.slice(idx * w * h, (idx + 1) * w * h)
        val expect = plane.map(b => (b & 0xff).toLong).sum * 1000L / (w * h)
        assert(milli == expect, s"frame $idx mean luma mismatch")
      }
    }
  }

  test("resizeImages: real downscale — decode, NN-map, re-encode") {
    import spark.implicits._
    // craft an oversized gradient image through the same codec path
    val w = 200; val h = 120
    val px = Array.tabulate(w * h)(i => ((i % w) * 255 / (w - 1)).toByte)
    val big = Seq(multimodal.MediaRow(7L, "image",
      Multimodal.encodeGray(px, w, h), w, h, 0, 0L)).toDS()
    val out = Multimodal.resizeImages(big, 128).collect().head
    assert(out.width == 128 && out.height == 120 * 128 / 200,
      s"got ${out.width}x${out.height}")
    val (rpx, rw, rh) = Multimodal.decodeGray(out.bytes)
    assert(rw == out.width && rh == out.height)
    // nearest-neighbor with integer index map: out(y,x) = in(y*h/nh, x*w/nw)
    for (y <- Seq(0, rh / 2, rh - 1); x <- Seq(0, rw / 2, rw - 1)) {
      val exp = px((y * h / rh) * w + x * w / rw)
      assert(rpx(y * rw + x) == exp, s"pixel ($x,$y) mismatch")
    }
    // within-bound images and non-images pass through untouched
    val small = Multimodal.syntheticMedia(spark, 9)
    val same = Multimodal.resizeImages(small, 256).collect().sortBy(_.media_id)
      .zip(small.collect().sortBy(_.media_id))
    same.foreach { case (r, o) => assert(r.bytes.toSeq == o.bytes.toSeq) }
  }

  test("quarantineMedia: corrupt payloads flagged, healthy ones pass") {
    import spark.implicits._
    val healthy = Multimodal.syntheticMedia(spark, 12).collect()
    val img = healthy.find(_.kind == "image").get
    val aud = healthy.find(_.kind == "audio").get
    val corrupted = Seq(
      // truncated PNG (header survives, data stream does not) and a
      // WAV clipped inside its RIFF header
      img.copy(media_id = 100L, bytes = img.bytes.take(16)),
      aud.copy(media_id = 101L, bytes = aud.bytes.take(8)),
      // a zero-byte video blob
      multimodal.MediaRow(102L, "video", Array.emptyByteArray, 320, 240,
        0, 1000L))
    val all = spark.createDataset(healthy.toSeq ++ corrupted)
    val flags = Multimodal.quarantineMedia(all).collect()
      .map(t => t._1 -> t._3).toMap
    healthy.foreach(m => assert(flags(m.media_id),
      s"healthy ${m.media_id} (${m.kind}) was quarantined"))
    Seq(100L, 101L, 102L).foreach(id =>
      assert(!flags(id), s"corrupt $id escaped quarantine"))
    // the ok-filtered set featurizes without throwing
    val okIds = flags.filter(_._2).keySet
    val feats = Multimodal.extractFeatures(
      all.filter(m => okIds.contains(m.media_id))).collect()
    assert(feats.length == healthy.length)
  }

  test("sampleFrames: videos only, correct count and timestamps") {
    val media = Multimodal.syntheticMedia(spark, 30)
    val frames = Multimodal.sampleFrames(media, 500L).collect()
    val vids = media.collect().filter(_.kind == "video")
      .map(m => m.media_id -> m.duration_ms).toMap
    assert(frames.map(_.media_id).toSet == vids.keySet)
    frames.groupBy(_.media_id).foreach { case (id, fs) =>
      assert(fs.length == (vids(id) / 500L + 1).toInt)
      assert(fs.sortBy(_.frame_idx).map(_.ts_ms).toSeq ==
        (0L to vids(id) by 500L).toSeq)
    }
  }

  test("imagePhashPairs: planted near-dups recovered exactly, via real decode") {
    val nBase = 60; val nDup = 20
    val pairs = Multimodal.imagePhashPairs(
      Multimodal.phashCorpus(spark, nBase, nDup).toDF("media_id", "bytes"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every planted (i, i+nBase) pair found and nothing else — the
    // 4-pixel xor-7 perturbation moves at most a couple of aHash cells
    // while unrelated md5-random images sit near hamming 32
    assert(pairs.map(p => (p._1, p._2)).toSet ==
      (0 until nDup).map(i => (i.toLong, (i + nBase).toLong)).toSet,
      s"got ${pairs.toSeq}")
    assert(pairs.forall(_._3 <= 3))
    // hash stability: the PNG encode/decode roundtrip yields identical
    // chunks to hashing the raw pixel stream directly
    val md = java.security.MessageDigest.getInstance("MD5")
    val px = new Array[Byte](256)
    for (k <- 0 until 16)
      System.arraycopy(md.digest(s"payload_7_$k".getBytes("UTF-8")),
        0, px, k * 16, 16)
    val direct = Multimodal.aHashChunks(px, 16, 16).toSeq
    val viaPng = {
      val (dec, w, h) = Multimodal.decodeGray(
        Multimodal.encodeGray(px, 16, 16))
      Multimodal.aHashChunks(dec, w, h).toSeq
    }
    assert(direct == viaPng)
  }

  test("audioFingerprintPairs: planted near-dups recovered via real WAV decode") {
    val nBase = 60; val nDup = 20
    val pairs = Multimodal.audioFingerprintPairs(
      Multimodal.audioFpCorpus(spark, nBase, nDup)
        .toDF("media_id", "bytes"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // perturbing only frame 0's samples can flip at most difference
    // bit 0 — every planted pair sits at hamming ≤ 1, nothing else
    // survives the ≤3 gate
    assert(pairs.map(p => (p._1, p._2)).toSet ==
      (0 until nDup).map(i => (i.toLong, (i + nBase).toLong)).toSet,
      s"got ${pairs.toSeq}")
    assert(pairs.forall(_._3 <= 1))
    // WAV roundtrip is byte-transparent: container decode changes
    // nothing about the fingerprint
    val md = java.security.MessageDigest.getInstance("MD5")
    val pcm = new Array[Byte](1040)
    for (k <- 0 until 65)
      System.arraycopy(md.digest(s"payload_3_$k".getBytes("UTF-8")),
        0, pcm, k * 16, 16)
    assert(Multimodal.audioFpChunks(pcm).toSeq ==
      Multimodal.audioFpChunks(
        Multimodal.decodeWav(Multimodal.encodeWav(pcm, 8000))._1).toSeq)
  }

  test("videoFingerprintPairs: planted near-dups recovered via real y4m demux") {
    val nBase = 60; val nDup = 20
    val pairs = Multimodal.videoFingerprintPairs(
      Multimodal.videoFpCorpus(spark, nBase, nDup)
        .toDF("media_id", "bytes"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // perturbing only frame 0's luma can flip at most difference
    // bit 0 — every planted pair sits at hamming ≤ 1, nothing else
    // survives the ≤3 gate
    assert(pairs.map(p => (p._1, p._2)).toSet ==
      (0 until nDup).map(i => (i.toLong, (i + nBase).toLong)).toSet,
      s"got ${pairs.toSeq}")
    assert(pairs.forall(_._3 <= 1))
    // y4m demux is stream-transparent for mono planes: container
    // roundtrip changes nothing about the fingerprint
    val md = java.security.MessageDigest.getInstance("MD5")
    val luma = new Array[Byte](1040)
    for (k <- 0 until 65)
      System.arraycopy(md.digest(s"vpayload_3_$k".getBytes("UTF-8")),
        0, luma, k * 16, 16)
    assert(Multimodal.videoFpChunks(luma, 16).toSeq ==
      Multimodal.videoFpChunks(
        Multimodal.decodeY4m(Multimodal.encodeY4m(luma, 4, 4, 65))._1,
        16).toSeq)
  }
}
