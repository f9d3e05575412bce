package graft.tools

import org.apache.spark.sql.SparkSession

/** Scaling diagnosis: time the bench scheduling round at several
  * (cores, shuffle-partitions) combos. */
object DebugScale {
  def main(args: Array[String]): Unit = {
    val frontierPath = "/tmp/graft_bench/frontier"
    val warmupPath = "/tmp/graft_bench/frontier_warmup"
    val configs = args.toSeq match {
      case Nil => Seq((2, 64), (8, 64), (32, 64))
      case xs => xs.map { a => val Array(c, p) = a.split(":"); (c.toInt, p.toInt) }
    }
    for ((cpus, sp) <- configs) {
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      val spark = SparkSession.builder().master(s"local[$cpus]")
        .appName(s"dbg-$cpus-$sp")
        .config("spark.sql.shuffle.partitions", sp)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "localhost")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      try {
        graft.Bench.scheduleRoundPublic(spark, warmupPath, cpus)
        val t0 = System.nanoTime()
        val n = graft.Bench.scheduleRoundPublic(spark, frontierPath, cpus)
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"RESULT cpus=$cpus sp=$sp time=$dt%.1fs n=$n thr=${4000000 / dt}%.0f/s")
      } finally spark.stop()
    }
  }
}
