package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkTestBase {

  test("decodeFeatures: deterministic, schema-stable, batch-correct") {
    val media = Multimodal.syntheticMedia(spark, 200, 4)
    val feats1 = Multimodal.decodeFeatures(media).collect().sortBy(_.media_id)
    val feats2 = Multimodal.decodeFeatures(
      Multimodal.sizeBalanced(media, 7)).collect().sortBy(_.media_id)
    assert(feats1.length == 200)
    // partition layout must not change the result (mapPartitions purity)
    feats1.zip(feats2).foreach { case (a, b) =>
      assert(a.media_id == b.media_id && a.checksum == b.checksum &&
        a.width == b.width && a.n_frames == b.n_frames &&
        a.feature.toSeq == b.feature.toSeq)
    }
  }

  test("audio rows have no dimensions; video rows frame-sampled") {
    val feats = Multimodal.decodeFeatures(
      Multimodal.syntheticMedia(spark, 300, 4), maxSide = 512, frameEveryK = 4)
      .collect()
    assert(feats.exists(_.kind == "audio"))
    feats.filter(_.kind == "audio").foreach(f => assert(f.width == -1 && f.height == -1))
    feats.filter(_.kind == "image").foreach(f => assert(f.n_frames == 1))
    feats.filter(_.kind == "video").foreach(f => assert(f.n_frames >= 1 && f.n_frames <= 4))
  }

  test("resize caps the longest side") {
    val feats = Multimodal.decodeFeatures(
      Multimodal.syntheticMedia(spark, 300, 4), maxSide = 256)
      .collect().filter(_.kind != "audio")
    feats.foreach(f => assert(math.max(f.width, f.height) <= 256, f.toString))
  }

  test("features are unit-norm") {
    val feats = Multimodal.decodeFeatures(Multimodal.syntheticMedia(spark, 50, 2)).collect()
    feats.foreach { f =>
      val n = math.sqrt(f.feature.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-4)
    }
  }
}
