package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer: `runMain graft.tools.TimeQuery <sfDir> <q1> [q2...]`
  * — same forcing as Bench (toRdd.count materializes every output column). */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.tail.foreach { name =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
      println(f"TIME $name: ${(System.nanoTime() - t0) / 1e9}%.1fs rows=$n")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
