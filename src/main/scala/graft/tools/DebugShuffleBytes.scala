package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shuffle-byte audit of the scheduling round: the narrow-projection round
  * versus the round-1 wide-row formulation, same 1M-URL frontier. Wall time
  * on this single host is compute-dominated (all shuffles are memory-local);
  * shuffle BYTES are what a real cluster pays the network for — this prints
  * the number the narrow rewrite actually moves. */
object DebugShuffleBytes {

  private final class Acc extends SparkListener {
    @volatile var bytes = 0L
    @volatile var records = 0L
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        bytes += m.shuffleWriteMetrics.bytesWritten
        records += m.shuffleWriteMetrics.recordsWritten
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sched.Scheduler
    import graft.seen.UrlSeen

    val raw = spark.read.parquet("/tmp/graft_bench/frontier")
    def enriched = raw
      .withColumn("__cp", graft.plans.UrlCanonPartsExpr.canonParts(col("url")))
      .withColumn("url_norm", col("__cp.url_norm"))
      .withColumn("url_hash", xxhash64(col("url_norm")))
      .withColumn("host", col("__cp.host"))
      .withColumn("depth", col("__cp.depth"))
      .drop("__cp")
      .withColumn("host_rank", lit(0))
      .withColumn("attempt", lit(0))
    def pending = enriched.filter(!col("is_processed"))
    def seen = enriched.filter(col("is_processed")).select("url_hash")
    val robots = graft.gen.Synthetic.robots(spark).toDF()
    val budgets = graft.gen.Synthetic.budgets(spark, Int.MaxValue).toDF()
    val expectedSeen = math.max(raw.count() / 4, 1L)

    def measure(tag: String)(job: => Long): Unit = {
      val acc = new Acc
      spark.sparkContext.addSparkListener(acc)
      val t0 = System.nanoTime()
      val n = job
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000) // let the listener bus drain
      spark.sparkContext.removeSparkListener(acc)
      spark.catalog.clearCache()
      println(f"RESULT $tag: scheduled=$n shuffle_bytes=${acc.bytes} (${acc.bytes / 1048576.0}%.1f MiB) shuffle_records=${acc.records} time=$dt%.1fs")
    }

    // round-1 wide formulation: dedup window + seen gate + schedule on FULL rows
    measure("wide  ") {
      val dedupW = Window.partitionBy(col("url_hash")).orderBy(col("discovered_seq"))
      val deduped = pending
        .withColumn("__rn", row_number().over(dedupW)).filter(col("__rn") === 1).drop("__rn")
      val unseen = UrlSeen.antiJoin(deduped, seen, "url_hash", expectedSeen, 0.03)
      val (now, _) = Scheduler.schedule(unseen, robots, budgets, Int.MaxValue, 64)
      now.count()
    }

    // round-2 narrow formulation
    measure("narrow") {
      val (now, _) = Scheduler.scheduleRoundNarrow(
        pending, robots, budgets, seen, expectedSeen, 0.03, Int.MaxValue, 64)
      now.count()
    }
    spark.stop()
  }
}
