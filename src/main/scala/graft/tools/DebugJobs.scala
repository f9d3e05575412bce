package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.AtomicInteger
import scala.collection.concurrent.TrieMap

/** Per-round JOB-COUNT audit for the scheduling round (VERDICT r03 #3): the
  * efficiency-vs-size trend said per-round FIXED cost (job/stage scheduling
  * overhead, broadcast builds, persist materializations), not the plan,
  * caps local scaling. This counts every Spark job one
  * Bench.scheduleRound fires, with description + stage/task counts, so
  * eliminated jobs are visible round-over-round.
  *
  * Usage: runMain graft.tools.DebugJobs [frontierPath] [cpus]
  */
object DebugJobs {
  def main(args: Array[String]): Unit = {
    val frontierPath = args.headOption.getOrElse("/tmp/graft_bench/frontier")
    val cpus = args.lift(1).map(_.toInt).getOrElse(8)
    val aqe = args.lift(2).forall(_ != "noaqe")
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName("graft-debug-jobs")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val jobDescs = TrieMap.empty[Int, (String, Long)]
    val jobStageCount = TrieMap.empty[Int, Int]
    var recording = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = if (recording) {
        jobs.incrementAndGet()
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(js.properties).flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse(js.stageInfos.map(_.name.takeWhile(_ != '\n')).mkString(" | ").take(160))
        jobDescs(js.jobId) = (desc, System.nanoTime())
        jobStageCount(js.jobId) = js.stageInfos.size
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = if (recording) {
        jobDescs.get(je.jobId).foreach { case (desc, t0) =>
          println(f"JOB ${je.jobId}%3d stages=${jobStageCount.getOrElse(je.jobId, -1)}%2d " +
            f"${(System.nanoTime() - t0) / 1e9}%6.2fs  $desc")
        }
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = if (recording) {
        stages.incrementAndGet()
        tasks.addAndGet(sc.stageInfo.numTasks)
      }
    })

    graft.Bench.ensureSeen(spark, frontierPath)
    graft.Bench.ensureSeen(spark, "/tmp/graft_bench/frontier_warmup")
    // warmup (JIT + codegen), not recorded
    graft.Bench.scheduleRoundPublic(spark, "/tmp/graft_bench/frontier_warmup", cpus)
    spark.catalog.clearCache()

    recording = true
    val t0 = System.nanoTime()
    val n = graft.Bench.scheduleRoundPublic(spark, frontierPath, cpus)
    val wall = (System.nanoTime() - t0) / 1e9
    recording = false
    Thread.sleep(500) // let listener drain
    println(f"TOTAL scheduled=$n jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get} wall=$wall%.1fs")
    spark.stop()
  }
}
