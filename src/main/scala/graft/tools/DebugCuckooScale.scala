package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Scale evidence for the cuckoo URL-seen sketch's reason to exist: at a
  * re-crawl/expiry boundary the Bloom build's only move is a full rebuild
  * over the seen table (∝ |seen| scan + shuffle + inserts), while the cuckoo
  * filters are maintained IN PLACE — deletes ∝ |expired|, inserts ∝ |new|,
  * plus a byte copy of the touched buckets (`UrlSeen.updateCuckooFilters`).
  *
  * Default shape: 16M seen (above PartitionedThreshold), 1% expiry window,
  * 1% newly-crawled inserts, 2M frontier straddling the seen range. Prints:
  *  - t_build (the once-per-crawl cost) and filter residency bytes;
  *  - t_update (the per-round incremental cost) vs t_rebuild (what Bloom
  *    would pay every round) and their ratio;
  *  - SHUFFLE BYTES per phase — the cluster-relevant asymmetry: on one box
  *    wall times are close (a uniform window touches every bucket, so update
  *    still rewrites the resident filter bytes), but update shuffles only
  *    the window's keys while rebuild re-shuffles the entire seen table —
  *    the term a 1000-executor network actually pays every round;
  *  - load factor + stash occupancy (the no-false-negative headroom);
  *  - gate-vs-exact equality over the evolved membership (correctness).
  */
object DebugCuckooScale {
  def main(args: Array[String]): Unit = {
    val seenN = args.headOption.map(_.toLong).getOrElse(16L * 1000 * 1000)
    val windowFrac = 100L // every 100th seen id expires; same count inserted fresh
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.seen.{CuckooFilter, UrlSeen}

    def hashed(from: Long, to: Long) =
      spark.range(from, to).select(xxhash64(col("id")).as("url_hash"))
    val seen = hashed(0, seenN)
    val expired = spark.range(0, seenN).filter(col("id") % windowFrac === 0)
      .select(xxhash64(col("id")).as("url_hash"))
    val fresh = hashed(seenN, seenN + seenN / windowFrac) // newly crawled this round
    val frontier = hashed(seenN - 1000000, seenN + 1000000)

    val b = UrlSeen.bucketCount(seenN)
    val perBucket = math.max(seenN / b, 1L)

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val shufBytes = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          shufBytes.addAndGet(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    // shuffle bytes are plan-deterministic; snapshot the counter around a
    // phase (with a drain sleep) to attribute bytes per phase
    def shuffled[T](f: => T): (T, Long) = {
      Thread.sleep(500); val b0 = shufBytes.get()
      val r = f
      Thread.sleep(500); (r, shufBytes.get() - b0)
    }

    // once-per-crawl: build + persist the sketch state
    val filters = UrlSeen.buildCuckooFilters(seen, "url_hash", seenN, b).persist()
    val ((nb, tBuild), shufBuild) = shuffled(timed(filters.count()))
    val stats = filters.select(col("__filter")).collect().map { r =>
      val f = CuckooFilter.deserialize(r.getAs[Array[Byte]](0))
      (r.getAs[Array[Byte]](0).length.toLong, f.occupiedSlots.toLong, f.stashSize.toLong,
        f.numBuckets.toLong * CuckooFilter.SlotsPerBucket)
    }
    val totalBytes = stats.map(_._1).sum
    val load = stats.map(_._2).sum.toDouble / stats.map(_._4).sum
    val stash = stats.map(_._3).sum
    println(f"RESULT build: buckets=$nb time=$tBuild%.1fs shuffle=${shufBuild / 1048576}MiB " +
      f"filter_bytes=$totalBytes (${totalBytes.toDouble / seenN}%.2f B/key resident) " +
      f"load=$load%.3f stash_total=$stash")

    // per-round incremental: delete expired + insert fresh, in place
    val updated = UrlSeen.updateCuckooFilters(filters, "url_hash", b, perBucket,
      deletes = Some(expired), inserts = Some(fresh)).persist()
    val ((nu, tUpdate), shufUpdate) = shuffled(timed(updated.count()))
    // what the Bloom path pays at the same boundary: rebuild over the full
    // evolved membership (seen ∖ expired ∪ fresh)
    val evolved = seen.join(expired, Seq("url_hash"), "left_anti").unionByName(fresh)
    val ((nr, tRebuild), shufRebuild) = shuffled(
      timed(UrlSeen.buildCuckooFilters(evolved, "url_hash", seenN, b).count()))
    println(f"RESULT maintenance: t_update=$tUpdate%.1fs (rows=$nu) vs t_rebuild=$tRebuild%.1fs " +
      f"(rows=$nr) wall_ratio=${tRebuild / tUpdate}%.1fx — update work ∝ |expired|+|new| = " +
      s"${2 * seenN / windowFrac} keys, rebuild ∝ |seen| = $seenN keys")
    println(f"RESULT shuffle: update=${shufUpdate / 1048576.0}%.1fMiB vs " +
      f"rebuild=${shufRebuild / 1048576.0}%.1fMiB ratio=${shufRebuild.toDouble / math.max(shufUpdate, 1)}%.1fx " +
      "— the per-round network cost a multi-executor cluster pays at the expiry boundary")

    // correctness of the gate over the evolved membership
    val exactSeen = evolved.distinct().persist()
    val (gateN, tGate) = timed(
      UrlSeen.antiJoinWithCuckoo(frontier, updated, exactSeen, "url_hash", b).count())
    val exactN = frontier.join(exactSeen, Seq("url_hash"), "left_anti").count()
    println(f"RESULT gate: cuckoo=$gateN exact=$exactN equal=${gateN == exactN} time=$tGate%.1fs")
    spark.stop()
  }
}
