package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The round-6 evidence probe for the pinned-sketch gate (VERDICT r05
  * "what's wrong" #1/#2): per steady-state round, how many SHUFFLE BYTES does
  * the re-crawl gate move, split into the sketch term vs the key term?
  *
  * Both gate transports ship in this binary, over the SAME checkpointed
  * parquet sketch and the SAME frontier:
  *  - OLD (r05): `UrlSeen.antiJoinWithCuckoo` — groupByKey+cogroup re-shuffles
  *    the ∝|seen| filter binaries EVERY round;
  *  - NEW (r06): `SketchHandle.pin` once (the only time sketch bytes cross an
  *    exchange), then `SketchHandle.gate` per round — zipPartitions against
  *    the pinned RDD, only the frontier's narrow rows move.
  * Likewise for the per-round incremental update (expiry deletes + fresh
  * inserts): `UrlSeen.updateCuckooFilters` over the parquet read (join pulls
  * the binaries through an exchange) vs `SketchHandle.update` (zip — lists
  * only). Output rows are asserted equal between transports.
  *
  * Usage: runMain graft.tools.DebugSketchGateBytes [seenN] [rounds]
  * Default 16M seen (the partitioned regime), 1% window, 2M frontier.
  */
object DebugSketchGateBytes {
  def main(args: Array[String]): Unit = {
    val seenN = args.headOption.map(_.toLong).getOrElse(16L * 1000 * 1000)
    val rounds = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.seen.{SketchHandle, UrlSeen}

    val shufBytes = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          shufBytes.addAndGet(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    def shuffled[T](tag: String)(f: => T): T = {
      Thread.sleep(500); val b0 = shufBytes.get()
      val r = f
      Thread.sleep(500)
      println(f"RESULT $tag shuffle=${(shufBytes.get() - b0) / 1048576.0}%.1fMiB")
      r
    }

    def hashed(from: Long, to: Long) =
      spark.range(from, to).select(xxhash64(col("id")).as("url_hash"))
    val seen = hashed(0, seenN)
    val expired = spark.range(0, seenN).filter(col("id") % 100 === 0)
      .select(xxhash64(col("id")).as("url_hash"))
    val fresh = hashed(seenN, seenN + seenN / 100)
    val frontier = hashed(seenN - 1000000, seenN + 1000000)
      .withColumn("host", concat(lit("h"), pmod(col("url_hash"), lit(50))))

    val b = UrlSeen.bucketCount(seenN)
    val perBucket = math.max(seenN / b, 1L)
    val sketchDir = s"/tmp/graft_sketch_probe_$seenN"
    if (!new java.io.File(s"$sketchDir/_SUCCESS").exists())
      UrlSeen.buildCuckooFilters(seen, "url_hash", seenN, b)
        .write.mode("overwrite").parquet(sketchDir)
    val sketchBytesOnDisk = new java.io.File(sketchDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    println(f"RESULT sketch_on_disk=${sketchBytesOnDisk / 1048576.0}%.1fMiB buckets=$b")
    val filtersParquet = spark.read.parquet(sketchDir)
    val exactSeen = seen

    // ---- OLD transport: cogroup gate over the parquet-read filters ----
    var oldRows = 0L
    (1 to rounds).foreach { r =>
      oldRows = shuffled(s"old_gate round=$r")(
        UrlSeen.antiJoinWithCuckoo(frontier, filtersParquet, exactSeen,
          "url_hash", b).count())
    }
    val oldUpd = shuffled("old_update")(
      UrlSeen.updateCuckooFilters(filtersParquet, "url_hash", b, perBucket,
        deletes = Some(expired), inserts = Some(fresh))
        .queryExecution.toRdd.count())

    // ---- NEW transport: pin once, zip-gate per round ----
    val handle = shuffled("new_pin_once")(
      { val h = SketchHandle.pin(filtersParquet, b, perBucket); h.rdd.count(); h })
    var newRows = 0L
    (1 to rounds).foreach { r =>
      newRows = shuffled(s"new_gate round=$r")(
        SketchHandle.gate(frontier, handle, exactSeen, "url_hash").count())
    }
    val newUpd = shuffled("new_update")(
      { val u = SketchHandle.update(handle, "url_hash",
          deletes = Some(expired), inserts = Some(fresh)); u.rdd.count() })

    println(s"RESULT gate_rows old=$oldRows new=$newRows equal=${oldRows == newRows}")
    println(s"RESULT update_buckets old=$oldUpd new=$newUpd")
    assert(oldRows == newRows, "gate transports disagree")
    spark.stop()
  }
}
