package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.lang.management.ManagementFactory
import scala.jdk.CollectionConverters._

object DebugRepeat {
  def main(args: Array[String]): Unit = {
    val mode = if (args.nonEmpty) args(0) else "expr"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def gcMs = ManagementFactory.getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    def jitMs = ManagementFactory.getCompilationMXBean.getTotalCompilationTime
    val raw = spark.read.parquet("/tmp/graft_bench/frontier")
    raw.count()
    for (i <- 1 to 5) {
      val g0 = gcMs; val j0 = jitMs; val t0 = System.nanoTime()
      mode match {
        case "expr" =>
          raw.withColumn("__cp", graft.plans.UrlCanonPartsExpr.canonParts(col("url")))
            .select(sum(length(col("__cp.url_norm")))).head
        case "map" =>
          import spark.implicits._
          raw.select("url").as[String]
            .mapPartitions(_.map(u => graft.url.UrlCanon.canonicalize(u).length.toLong))
            .reduce(_ + _)
        case "pure" =>
          // driver-only single-threaded: 4M canonicalizations, no Spark
          var s = 0L; var id = 0L
          while (id < 4000000) { s += graft.url.UrlCanon.canonicalize(graft.gen.Synthetic.url(id, "en")).length; id += 1 }
          println(s"pure sum $s")
      }
      println(f"RUN $i: ${(System.nanoTime() - t0) / 1e9}%.1fs gc=${(gcMs - g0) / 1000.0}%.1fs jit=${(jitMs - j0) / 1000.0}%.1fs")
    }
    spark.stop()
  }
}
