package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkTestBase {

  test("decodeFeatures: deterministic, schema-stable, batch-correct") {
    val media = Multimodal.syntheticMedia(spark, 200, 4)
    val feats1 = Multimodal.decodeFeatures(media).collect().sortBy(_.media_id)
    val feats2 = Multimodal.decodeFeatures(
      Multimodal.sizeScaledPartitions(media, targetBytesPerTask = 64 * 1024))
      .collect().sortBy(_.media_id)
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

  test("sizeScaledPartitions: task count tracks total payload bytes, rows preserved") {
    val media = Multimodal.syntheticMedia(spark, 400, 4)
    val totalBytes = media.toDF()
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.octet_length(
          org.apache.spark.sql.functions.col("payload")))).head.getLong(0)
    val target = 100L * 1024
    val scaled = Multimodal.sizeScaledPartitions(media, targetBytesPerTask = target)
    val expectedParts = ((totalBytes + target - 1) / target).toInt
    assert(scaled.rdd.getNumPartitions == expectedParts)
    assert(scaled.count() == 400)
    // double the target -> roughly half the tasks (count scales with bytes)
    val coarser = Multimodal.sizeScaledPartitions(media, targetBytesPerTask = 2 * target)
    assert(coarser.rdd.getNumPartitions == ((totalBytes + 2 * target - 1) / (2 * target)).toInt)
  }

  test("sizeScaledPartitionsFromFiles sizes from file metadata, no data scan") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-media").toString
    Multimodal.syntheticMedia(spark, 300, 4).toDF()
      .write.mode("overwrite").parquet(dir)
    val onDisk = spark.read.parquet(dir).as[Multimodal.MediaRow]
    val totalFileBytes = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    val target = 64L * 1024
    val scaled = Multimodal.sizeScaledPartitionsFromFiles(onDisk, target)
    assert(scaled.rdd.getNumPartitions ==
      ((totalFileBytes + target - 1) / target).toInt)
    assert(scaled.count() == 300)
    // non-file sources fall back to the scan-based sizing
    val mem = Multimodal.syntheticMedia(spark, 50, 2)
    assert(Multimodal.sizeScaledPartitionsFromFiles(mem, 100L * 1024).count() == 50)
  }

  test("sizeScaledPartitions on an empty corpus yields one partition, no NPE") {
    val empty = Multimodal.syntheticMedia(spark, 0, 2)
    val scaled = Multimodal.sizeScaledPartitions(empty)
    assert(scaled.rdd.getNumPartitions == 1)
    assert(scaled.count() == 0)
  }

  test("features are unit-norm") {
    val feats = Multimodal.decodeFeatures(Multimodal.syntheticMedia(spark, 50, 2)).collect()
    feats.foreach { f =>
      val n = math.sqrt(f.feature.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-4)
    }
  }
}
