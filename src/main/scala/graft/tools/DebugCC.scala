package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import java.util.concurrent.ConcurrentLinkedQueue

/** Giant-component skew probe for ConnectedComponents (VERDICT r04 #1).
  *
  * Builds a 1M-node graph that converges to ONE giant component — C star
  * clusters (maximal label fan-in) whose centers are chained (so pointer
  * halving needs ~log2(C) rounds and intermediate rounds carry labels with
  * huge frequency) — and runs the labeling twice on the same input:
  *   - hot OFF (hotThreshold = Long.MaxValue): every halving lookup goes
  *     through the shuffle join, so the reducer owning the current giant
  *     label receives the whole component;
  *   - hot ON (default threshold 65536): giant labels resolve through the
  *     broadcast map and never shuffle.
  *
  * Reported per run: wall seconds, max single-task duration and the
  * p50/p99 task durations across all stages (SparkListener) — the straggler
  * the fix removes is the max-task number. Order is interleaved OFF/ON/OFF/
  * ON and minimums are taken per mode (BASELINE.md host-throttling rule).
  *
  * Usage: runMain graft.tools.DebugCC [nodes] [clusters] [rounds]
  */
object DebugCC {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val clusters = args.lift(1).map(_.toInt).getOrElse(64)
    val rounds = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._

    val perCluster = n / clusters
    val nodes = spark.range(0, n, 1, 32).toDF("doc_id")
    // star edges: member -> its cluster's center (id c*perCluster), plus a
    // chain over the centers so everything merges into ONE giant component
    val stars = spark.range(0, n, 1, 32)
      .filter(col("id") % perCluster =!= 0)
      .select((col("id") - (col("id") % perCluster)).as("a"), col("id").as("b"))
    val chain = spark.range(0, clusters - 1, 1, 4)
      .select((col("id") * perCluster).as("a"), ((col("id") + 1) * perCluster).as("b"))
    val edges = stars.unionByName(chain)

    // DETERMINISTIC skew evidence: per-task shuffle-read RECORDS. Wall/task
    // times on this host are throttle-noise (BASELINE.md); where the rows
    // LAND is a pure function of the plan — the off-path must show a single
    // task reading ~the whole component, the on-path must not.
    val reads = new ConcurrentLinkedQueue[Long]()
    val durations = new ConcurrentLinkedQueue[Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        if (t.taskInfo != null) durations.add(t.taskInfo.duration)
        if (t.taskMetrics != null && t.taskMetrics.shuffleReadMetrics != null)
          reads.add(t.taskMetrics.shuffleReadMetrics.recordsRead)
      }
    })

    def run(tag: String, thr: Long): (Double, Long, Long) = {
      reads.clear(); durations.clear()
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val out = graft.graph.ConnectedComponents.components(nodes, edges, hotThreshold = thr)
      val cnt = out.filter(col("component") === 0L).count()
      val wall = (System.nanoTime() - t0) / 1e9
      require(cnt == n, s"$tag: expected one giant component, got $cnt/$n at label 0")
      // let straggler listener events drain (listenerBus is private[spark])
      Thread.sleep(1500)
      val rs = reads.toArray(Array.empty[java.lang.Long]).map(_.toLong).sorted
      val maxRead = if (rs.isEmpty) 0L else rs.last
      val p99Read = if (rs.isEmpty) 0L else rs((rs.length * 99) / 100 min (rs.length - 1))
      println(f"RESULT $tag%-8s n=$n clusters=$clusters wall=$wall%.1fs " +
        f"task_read_max=$maxRead task_read_p99=$p99Read tasks=${rs.length}")
      (wall, maxRead, p99Read)
    }

    // interleaved rounds; shuffle-read maxima are plan-deterministic (the
    // per-round repetition only confirms it), wall is reported as min
    val offs = collection.mutable.ArrayBuffer[(Double, Long, Long)]()
    val ons = collection.mutable.ArrayBuffer[(Double, Long, Long)]()
    (1 to rounds).foreach { r =>
      offs += run(s"off_$r", Long.MaxValue)
      ons += run(s"on_$r", graft.graph.ConnectedComponents.HotLabelThreshold)
    }
    val (wOff, mOff, pOff) = (offs.map(_._1).min, offs.map(_._2).max, offs.map(_._3).max)
    val (wOn, mOn, pOn) = (ons.map(_._1).min, ons.map(_._2).max, ons.map(_._3).max)
    println(f"SUMMARY hot_off: wall=$wOff%.1fs task_read_max=$mOff (${100.0 * mOff / n}%.1f%% of n) task_read_p99=$pOff")
    println(f"SUMMARY hot_on:  wall=$wOn%.1fs task_read_max=$mOn (${100.0 * mOn / n}%.1f%% of n) task_read_p99=$pOn")
    println(f"SUMMARY hottest_task_rows off/on = ${mOff.toDouble / math.max(mOn, 1)}%.1fx")
    spark.stop()
  }
}
