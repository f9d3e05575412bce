package graft.tools

import org.apache.spark.sql.SparkSession

/** Scaling diagnosis: time the bench scheduling round at several
  * (cores, shuffle-partitions) combos. Optional first arg `path=<frontier
  * parquet>` overrides the input (e.g. a 16M-row frontier for the
  * efficiency-vs-problem-size trend); remaining args are cores:partitions
  * combos, run IN ORDER (interleave levels across repeats yourself). */
object DebugScale {
  def main(args: Array[String]): Unit = {
    val (kvArgs, comboArgs) = args.partition(a =>
      a.startsWith("path=") || a.startsWith("gen=") || a.startsWith("maxpart="))
    // input split sizing: at 64M+ rows the 64-file gen layout yields ~1M-row
    // input partitions whose partial-aggregation maps exhaust execution
    // memory and force storage eviction — size splits DOWN as input grows
    // (the spark.sql.files.maxPartitionBytes guidance in BASELINE.md)
    val maxPart = kvArgs.find(_.startsWith("maxpart=")).map(_.stripPrefix("maxpart="))
      .getOrElse("128m")
    val frontierPath = kvArgs.find(_.startsWith("path=")).map(_.stripPrefix("path="))
      .getOrElse("/tmp/graft_bench/frontier")
    val warmupPath = "/tmp/graft_bench/frontier_warmup"
    // gen=N: write an N-row synthetic frontier to `path` first (if absent)
    kvArgs.find(_.startsWith("gen=")).map(_.stripPrefix("gen=").toLong).foreach { n =>
      if (!new java.io.File(s"$frontierPath/_SUCCESS").exists()) {
        val s = SparkSession.builder().master("local[32]")
          .config("spark.ui.enabled", "false")
          .config("spark.driver.host", "localhost").getOrCreate()
        s.sparkContext.setLogLevel("WARN")
        import s.implicits._
        s.range(0, n, 1, 64).mapPartitions { it =>
          it.map { seqBoxed =>
            val seq: Long = seqBoxed
            val id: Long = if (seq % 11 == 10) seq - 1 else seq
            (graft.gen.Synthetic.category(id), graft.gen.Synthetic.url(id, "en"),
              (graft.gen.Synthetic.mix2(id, 19) & 7) == 0 && seq % 11 != 10, seq)
          }
        }.toDF("category", "url", "is_processed", "discovered_seq")
          .write.mode("overwrite").parquet(frontierPath)
        s.stop()
        SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      }
    }
    val configs = comboArgs.toSeq match {
      case Nil => Seq((2, 64), (8, 64), (32, 64))
      case xs => xs.map { a => val Array(c, p) = a.split(":"); (c.toInt, p.toInt) }
    }
    // seen-table parquets (untimed prep, like Bench main's)
    locally {
      val s = SparkSession.builder().master("local[32]")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "localhost").getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      try { graft.Bench.ensureSeen(s, frontierPath); graft.Bench.ensureSeen(s, warmupPath) }
      finally { s.stop(); SparkSession.clearActiveSession(); SparkSession.clearDefaultSession() }
    }
    for ((cpus, sp) <- configs) {
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      val spark = SparkSession.builder().master(s"local[$cpus]")
        .appName(s"dbg-$cpus-$sp")
        .config("spark.sql.shuffle.partitions", sp)
        .config("spark.sql.files.maxPartitionBytes", maxPart)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "localhost")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      try {
        graft.Bench.scheduleRoundPublic(spark, warmupPath, cpus)
        val t0 = System.nanoTime()
        val n = graft.Bench.scheduleRoundPublic(spark, frontierPath, cpus)
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"RESULT cpus=$cpus sp=$sp time=$dt%.1fs scheduled=$n")
      } finally spark.stop()
    }
  }
}
