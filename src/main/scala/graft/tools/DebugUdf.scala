package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

object DebugUdf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.url.UrlCanon

    def stage[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name: ${(System.nanoTime() - t0) / 1e9}%.1fs"); r
    }

    val raw = spark.read.parquet("/tmp/graft_bench/frontier")
    stage("scan-warm")(raw.count()); stage("scan-warm2")(raw.count())

    // pure UDF cost (force evaluation via agg over the result)
    val e1 = raw.withColumn("__cp", UrlCanon.canonPartsUdf(col("url")))
    stage("udf-canonParts")(e1.select(sum(length(col("__cp.url_norm")))).head)
    stage("udf-canonParts2")(e1.select(sum(length(col("__cp.url_norm")))).head)

    // plain canon UDF (string only)
    val e2 = raw.withColumn("n", UrlCanon.canonUdf(col("url")))
    stage("udf-canonOnly")(e2.select(sum(length(col("n")))).head)

    // native Catalyst expression
    val e3 = raw.withColumn("__cp", graft.plans.UrlCanonPartsExpr.canonParts(col("url")))
    stage("expr-canonParts")(e3.select(sum(length(col("__cp.url_norm")))).head)
    stage("expr-canonParts2")(e3.select(sum(length(col("__cp.url_norm")))).head)
    stage("expr-canonParts3")(e3.select(sum(length(col("__cp.url_norm")))).head)

    // scala-side baseline: mapPartitions canonicalize
    import spark.implicits._
    stage("mapPartitions-canon") {
      raw.select("url").as[String].mapPartitions(_.map(u => UrlCanon.canonicalize(u).length.toLong))
        .reduce(_ + _)
    }

    // materialize enriched to parquet, then isolate downstream stages
    val enriched = raw
      .withColumn("__cp", UrlCanon.canonPartsUdf(col("url")))
      .select(col("category"), col("url"), col("is_processed"), col("discovered_seq"),
        col("__cp.url_norm").as("url_norm"), xxhash64(col("__cp.url_norm")).as("url_hash"),
        col("__cp.host").as("host"), col("__cp.depth").as("depth"))
    stage("write-enriched")(enriched.write.mode("overwrite").parquet("/tmp/graft_bench/enriched"))
    val ep = spark.read.parquet("/tmp/graft_bench/enriched")
    stage("window-dedup") {
      val w = Window.partitionBy(col("url_hash")).orderBy(col("discovered_seq"))
      ep.filter(!col("is_processed"))
        .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).count()
    }
    stage("groupBy-dedup") {
      ep.filter(!col("is_processed"))
        .groupBy("url_hash").agg(min(struct(col("discovered_seq"), col("url"))).as("m")).count()
    }
    stage("bloom-build") {
      ep.filter(col("is_processed")).stat.bloomFilter("url_hash", 600000, 0.03)
    }
    stage("cache-4m") {
      val c = ep.persist(); c.count()
    }
    stage("cache-read2") {
      ep.count(); ep.count()
    }
    spark.stop()
  }
}
