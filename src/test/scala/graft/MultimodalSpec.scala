package graft

import graft.multimodal.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing spec: schema/typing, deterministic stub decode,
  * resize metadata math, frame-sample explode shape. */
class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("syntheticMedia: deterministic, all kinds, bounded payloads") {
    val a = Multimodal.syntheticMedia(spark, 30).collect().sortBy(_.media_id)
    val b = Multimodal.syntheticMedia(spark, 30).collect().sortBy(_.media_id)
    assert(a.map(_.bytes.toSeq).toSeq == b.map(_.bytes.toSeq).toSeq)
    assert(a.map(_.kind).toSet == Set("image", "audio", "video"))
    assert(a.forall(m => m.bytes.length >= 256 && m.bytes.length < 1024))
  }

  test("decodeStub: 16-dim normalized histogram per asset") {
    val feats = Multimodal.decodeStub(Multimodal.syntheticMedia(spark, 20))
      .collect()
    assert(feats.length == 20)
    feats.foreach { f =>
      assert(f.features.length == 16)
      assert(math.abs(f.features.sum - 1.0f) < 1e-3f,
        s"histogram of ${f.media_id} not normalized")
    }
  }

  test("resizeStub: caps max side, preserves aspect, shrinks bytes") {
    val media = Multimodal.syntheticMedia(spark, 60)
    val resized = Multimodal.resizeStub(media, 128).collect()
      .filter(_.kind == "image")
    val orig = media.collect().filter(_.kind == "image")
      .map(m => m.media_id -> m).toMap
    resized.foreach { m =>
      assert(math.max(m.width, m.height) <= 128)
      val o = orig(m.media_id)
      if (math.max(o.width, o.height) > 128) {
        val ratioO = o.width.toDouble / o.height
        val ratioN = m.width.toDouble / m.height
        assert(math.abs(ratioO - ratioN) / ratioO < 0.1, "aspect drifted")
        assert(m.bytes.length <= o.bytes.length)
      }
    }
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

  test("pipeline: joins features with frame counts, non-video gets 0") {
    val out = Multimodal.pipeline(spark, 50).collect()
    assert(out.length == 50)
    out.foreach { r =>
      val kind = r.getString(1)
      val nFrames = r.getLong(4)
      if (kind == "video") assert(nFrames >= 1) else assert(nFrames == 0)
    }
  }
}
