package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import java.lang.management.ManagementFactory
import scala.jdk.CollectionConverters._

object DebugStages {
  private def gcMs: Long =
    ManagementFactory.getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum

  def main(args: Array[String]): Unit = {
    val cpus = if (args.nonEmpty) args(0).toInt else 32
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.url.UrlCanon
    import graft.seen.UrlSeen
    import graft.sched.Scheduler

    def stage[T](name: String)(f: => T): T = {
      val g0 = gcMs; val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $name: ${(System.nanoTime() - t0) / 1e9}%.1fs gc=${(gcMs - g0) / 1000.0}%.1fs")
      r
    }

    val raw = spark.read.parquet("/tmp/graft_bench/frontier")
    stage("scan")(raw.count())
    val enriched = raw
      .withColumn("__cp", UrlCanon.canonPartsUdf(col("url")))
      .withColumn("url_norm", col("__cp.url_norm"))
      .withColumn("url_hash", xxhash64(col("url_norm")))
      .withColumn("host", col("__cp.host"))
      .withColumn("depth", col("__cp.depth"))
      .drop("__cp")
      .withColumn("host_rank", lit(0))
      .withColumn("attempt", lit(0))
    stage("enrich+count")(enriched.count())
    val pending = enriched.filter(!col("is_processed"))
    val seen = enriched.filter(col("is_processed")).select("url_hash")
    val dedupW = Window.partitionBy(col("url_hash")).orderBy(col("discovered_seq"))
    val deduped = pending
      .withColumn("__rn", row_number().over(dedupW)).filter(col("__rn") === 1).drop("__rn")
    stage("dedup")(deduped.count())
    val seenCount = stage("seenCount")(seen.count())
    val unseen = stage("bloomBuild+anti") {
      UrlSeen.antiJoin(deduped, seen, "url_hash", seenCount, 0.03)
    }
    stage("unseenCount")(unseen.count())
    val allowed = stage("robots") {
      graft.politeness.Politeness.applyRobots(unseen, graft.gen.Synthetic.robots(spark).toDF())
    }
    val budgeted = stage("budget") {
      val b = graft.politeness.Politeness.applyBudgets(
        allowed, graft.gen.Synthetic.budgets(spark, Int.MaxValue).toDF(), Int.MaxValue)
      b.filter(col("scheduled_now")).count()
      b
    }
    stage("order") {
      val now = budgeted.filter(col("scheduled_now")).drop("scheduled_now")
      Scheduler.withCrawlOrder(now,
        Seq(col("host_rank"), col("depth"), col("discovered_seq"), col("url_hash")), 64).count()
    }
    println(s"TOTAL gc=${gcMs / 1000.0}s")
    spark.stop()
  }
}
