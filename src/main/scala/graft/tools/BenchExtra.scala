package graft.tools

import org.apache.spark.sql.SparkSession

/** Supplementary bench (Bench.scala is measurement-frozen in the
  * optimization round): the ≥0.8 two-cluster-size gate pair — the SAME 4M
  * scheduling round at local[1] and local[4] (the bus-headroom regime, see
  * Bench.scala's cores14 rationale) — interleaved min-of-N, printed as one
  * JSON line. VERDICT r05 #8 asked for `sched_scaling_eff_1_to_4_4m`; it
  * cannot ride BENCH_r06.json without touching the frozen harness, so it is
  * recorded here and cited in OPTIMIZATION_r06.md.
  *
  * Usage: runMain graft.tools.BenchExtra [rounds]
  * (expects the Bench prep to have populated /tmp/graft_bench/frontier4m —
  * run graft.Bench once first, or any frontier path via arg 2)
  */
object BenchExtra {
  private def session(cpus: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder().master(s"local[$cpus]")
      .appName(s"graft-bench-extra-$cpus")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_BENCH_SP", "64").toInt)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val rounds = args.headOption.map(_.toInt).getOrElse(2)
    val path = args.lift(1).getOrElse("/tmp/graft_bench/frontier4m")
    val cores = Seq(1, 4)
    val best = scala.collection.mutable.Map(cores.map(_ -> Double.MaxValue): _*)
    var n = 0L
    for (r <- 1 to rounds; c <- cores) {
      val s = session(c)
      try {
        graft.Bench.ensureSeen(s, path)
        val t0 = System.nanoTime()
        n = graft.Bench.scheduleRoundPublic(s, path, c)
        val dt = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[bench-extra] round $r local[$c]: $dt%.1fs")
        best(c) = math.min(best(c), dt)
      } finally s.stop()
    }
    val eff = (n / best(4)) / (4.0 * (n / best(1)))
    println(s"""{"sched4m_sec_local1":${f"${best(1)}%.2f"},""" +
      s""""sched4m_sec_local4":${f"${best(4)}%.2f"},""" +
      s""""scheduled":$n,"sched_scaling_eff_1_to_4_4m":${f"$eff%.3f"}}""")
  }
}
