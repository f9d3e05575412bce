package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sched.Scheduler

object DebugOrder {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val clicks = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
      .filter(col("event_type") === "click")
    val ranged = clicks
      .repartitionByRange(8, col("ts"), col("event_id"))
      .sortWithinPartitions(col("ts"), col("event_id"))
      .persist()
    val counts = ranged.groupBy(spark_partition_id().as("__pid")).count().collect()
    println("counts: " + counts.map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1).mkString(", "))
    val out = Scheduler.withCrawlOrder(clicks, Seq(col("ts"), col("event_id")), 8)
    // the coalesce(1) path that broke TaskContext-based numbering:
    out.coalesce(1).write.mode("overwrite").parquet("/tmp/debug_order")
    val rt = spark.read.parquet("/tmp/debug_order")
    val zeros = rt.filter(col("crawl_order") === 0).count()
    val distinct = rt.select("crawl_order").distinct().count()
    val total = rt.count()
    println(s"rows with crawl_order=0: $zeros; distinct=$distinct total=$total")
    rt.groupBy().agg(max("crawl_order")).show()
    spark.stop()
  }
}
