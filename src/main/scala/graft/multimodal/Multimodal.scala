package graft.multimodal

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline at 100 TB scale.
  *
  * Media (image/audio/video frames) are opaque `binary` columns with typed
  * metadata, processed in PARTITION-SIZED BATCHES — the Scala analogue of
  * `mapInPandas`: one decoder/model instance per partition, amortized over
  * all rows of that partition, never per row. The actual codec is STUBBED
  * (no image/audio libraries ship in this sandbox): `StubDecoder` produces a
  * deterministic fake decode derived from the bytes. Everything around it —
  * schema, batch shape, partition sizing, the resize/frame-sample
  * signatures — is the real, tested Spark plumbing; swapping the stub for
  * javacpp/ffmpeg is a one-class change.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata (the `pages.html` binary
    * column generalized). */
  final case class MediaRow(
      media_id: Long,
      kind: String,            // "image" | "audio" | "video"
      payload: Array[Byte],
      mime: String,
      captured_ts: Timestamp)

  /** Decoded features: fixed-shape output of the decode+featurize batch. */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      width: Int, height: Int,       // image/video; -1 for audio
      n_frames: Int,                 // video frame-sample count; 1 image
      checksum: String,              // md5 hex of the payload
      feature: Array[Float])         // unit-norm fake embedding (dim 8)

  /** The per-partition decoder. One instance per partition (like a model
    * handle in mapInPandas); `decode` is the stub boundary.
    *
    * The fake decode derives everything from md5(payload) — md5 is the one
    * hash both this engine and the DuckDB oracle share, so the metadata half
    * of the decode (n_bytes/width/height/n_frames/checksum) is exactly
    * cross-engine replayable (q_multimodal_decode); only the fake feature
    * vector stays engine-side (covered by MultimodalSpec determinism). */
  final class StubDecoder {
    private val md = java.security.MessageDigest.getInstance("MD5")

    def decode(row: MediaRow): MediaFeatures = {
      md.reset()
      val digest = md.digest(row.payload)
      val hex = digest.map(b => f"${b & 0xFF}%02x").mkString
      def nib(i: Int): Int = Character.digit(hex.charAt(i), 16)
      val isAudio = row.kind == "audio"
      val v3 = nib(0) * 256 + nib(1) * 16 + nib(2)
      val v6 = nib(3) * 256 + nib(4) * 16 + nib(5)
      val w = if (isAudio) -1 else 64 + v3 % 1024
      val hgt = if (isAudio) -1 else 64 + v6 % 1024
      val frames = if (row.kind == "video") 1 + nib(6) else 1
      // feature: splitmix over the digest (deterministic, not oracle-checked)
      var h = 0x9E3779B97F4A7C15L
      digest.foreach(b => h = graft.gen.Synthetic.mix(h ^ b))
      val raw = Array.tabulate(8)(d => (graft.gen.Synthetic.mix2(h, d) & 0xFFFF).toFloat)
      val norm = math.sqrt(raw.map(x => x.toDouble * x).sum).toFloat
      MediaFeatures(row.media_id, row.kind, row.payload.length, w, hgt, frames, hex,
        raw.map(_ / norm))
    }

    /** Resize signature (stub: integer arithmetic only, so the oracle's
      * integer division replays it bit-for-bit — no float rounding drift). */
    def resize(f: MediaFeatures, maxSide: Int): MediaFeatures =
      if (f.width <= maxSide && f.height <= maxSide) f
      else {
        val m = math.max(f.width, f.height)
        f.copy(width = f.width * maxSide / m, height = f.height * maxSide / m)
      }

    /** Frame-sample signature: keep every k-th frame index. */
    def frameSample(f: MediaFeatures, everyK: Int): MediaFeatures =
      f.copy(n_frames = math.max(1, f.n_frames / math.max(1, everyK)))
  }

  /** Batched decode over the whole Dataset — mapPartitions so the decoder
    * is constructed once per partition; rows stream through without
    * collecting the partition. */
  def decodeFeatures(
      media: Dataset[MediaRow],
      maxSide: Int = 512,
      frameEveryK: Int = 4): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val dec = new StubDecoder // one per partition, like a model handle
      it.map(r => dec.frameSample(dec.resize(dec.decode(r), maxSide), frameEveryK))
    }
  }

  /** Size-aware repartition before decoding: the partition COUNT is derived
    * from the corpus' total payload bytes (≈ targetBytesPerTask of media per
    * decode task), so a corpus 100× the size gets 100× the decode tasks
    * instead of 100×-fatter ones. Assignment within that count is a uniform
    * id-hash: with rows ≫ partitions the per-task byte totals concentrate
    * tightly around targetBytesPerTask (law of large numbers); a single
    * payload larger than the target is indivisible and lower-bounds the
    * tail no matter the partitioner. One cheap metadata/agg pass for the
    * total, then one shuffle. */
  def sizeScaledPartitions(
      media: Dataset[MediaRow],
      targetBytesPerTask: Long = 64L * 1024 * 1024): Dataset[MediaRow] = {
    val df = media.toDF()
    // coalesce: sum over zero rows is null (an empty corpus is 0 bytes)
    val totalBytes = df.agg(coalesce(sum(octet_length(col("payload"))), lit(0L)))
      .head.getLong(0)
    val numPartitions = math.max(1L, (totalBytes + targetBytesPerTask - 1) / targetBytesPerTask).toInt
    import media.sparkSession.implicits._
    df.repartition(numPartitions, xxhash64(col("media_id"))).as[MediaRow]
  }

  /** File-metadata variant for parquet-backed media (the 100 TB path): the
    * partition count comes from the input FILES' total length — one
    * driver-side FileStatus pass, O(#files) metadata, no data scan — where
    * [[sizeScaledPartitions]] would read every payload byte just to pick a
    * number (VERDICT r02). Compressed size slightly undercounts decoded
    * payload bytes; for task sizing that bias is a constant factor folded
    * into targetBytesPerTask. Falls back to the scan-based variant when the
    * Dataset has no file-based source (e.g. synthetic in-memory media). */
  def sizeScaledPartitionsFromFiles(
      media: Dataset[MediaRow],
      targetBytesPerTask: Long = 64L * 1024 * 1024): Dataset[MediaRow] = {
    val spark = media.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val paths = media.inputFiles
    if (paths.isEmpty) return sizeScaledPartitions(media, targetBytesPerTask)
    val totalBytes = paths.map { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(conf).getFileStatus(hp).getLen
    }.sum
    val numPartitions = math.max(1L, (totalBytes + targetBytesPerTask - 1) / targetBytesPerTask).toInt
    import media.sparkSession.implicits._
    media.toDF().repartition(numPartitions, xxhash64(col("media_id"))).as[MediaRow]
  }

  /** Deterministic synthetic media corpus for tests/bench. */
  def syntheticMedia(spark: SparkSession, n: Long, numPartitions: Int = 8): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n, 1, numPartitions).map { idBoxed =>
      val id: Long = idBoxed
      val kind = (graft.gen.Synthetic.mix2(id, 1) % 3).abs match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val len = 64 + (graft.gen.Synthetic.mix2(id, 2) & 0xFFF).toInt
      val bytes = Array.tabulate(len)(i => (graft.gen.Synthetic.mix2(id, i.toLong) & 0xFF).toByte)
      MediaRow(id, kind, bytes, s"application/x-$kind",
        new Timestamp(1700000000000L + id))
    }
  }
}
