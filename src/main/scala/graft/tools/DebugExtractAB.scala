package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B: the fetch+extract probe with the native ExtractAllExpr vs the
  * ScalaUDF it replaced, interleaved min-of-rounds at local[32] — isolates
  * whether an extract-throughput delta is the expression or the host. */
object DebugExtractAB {
  def main(args: Array[String]): Unit = {
    val rounds = args.headOption.map(_.toInt).getOrElse(3)
    val pagesPath = "/tmp/graft_bench/pages"
    def session(): SparkSession = {
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      val s = SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", 64)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "localhost").getOrCreate()
      s.sparkContext.setLogLevel("WARN"); s
    }

    def run(mode: String): Double = {
      val spark = session()
      try {
        val pages = spark.read.parquet(pagesPath)
          .withColumn("url_norm",
            graft.plans.UrlCanonExpr.canon(regexp_replace(col("url"), "/ar/", "/en/")))
        val fields = mode match {
          case "binary" => // bytes straight into the expression (round 5)
            graft.plans.ExtractAllExpr.extractAll(col("html"), col("lang"))
          case "decode" => // the r04 shape: decode column op first
            graft.plans.ExtractAllExpr.extractAll(decode(col("html"), "UTF-8"), col("lang"))
          case _ =>
            graft.extract.Extractors.extractAllUdf(decode(col("html"), "UTF-8"), col("lang"))
        }
        val withFields = pages.withColumn("fields", fields)
        val pivoted = graft.extract.Extractors.pivotLangs(withFields, "url_norm")
          .withColumn("url_en", coalesce(col("url_en"), col("url_norm")))
        val products = graft.extract.Extractors.carrefourProduct(pivoted, "2024-11-10")
        // warmup
        products.select(count(lit(1))).head
        val t0 = System.nanoTime()
        products.select(count(lit(1)).as("n"),
          sum(length(col("name_en")) + length(col("name_ar"))).as("chk")).head
        (System.nanoTime() - t0) / 1e9
      } finally spark.stop()
    }

    // ROTATE the mode order per round: in a shared JVM the first run of a
    // round inherits the previous run's GC/teardown debt and the last gets
    // the warmest code cache — a fixed order hands the last mode a
    // systematic ~5-10% edge (observed: whichever mode ran last "won").
    val modes = Array("binary", "decode", "udf")
    val mins = scala.collection.mutable.Map(modes.map(_ -> Double.MaxValue): _*)
    for (r <- 1 to rounds) {
      val order = Array.tabulate(3)(k => modes((r + k) % 3))
      val t = order.map(m => m -> run(m)).toMap
      modes.foreach(m => mins(m) = math.min(mins(m), t(m)))
      println(f"ROUND $r (order ${order.mkString(",")}) " +
        f"binary=${t("binary")}%.2fs decode=${t("decode")}%.2fs udf=${t("udf")}%.2fs")
    }
    val minB = mins("binary"); val minE = mins("decode"); val minU = mins("udf")
    println(f"RESULT binary_min=$minB%.2fs decode_min=$minE%.2fs udf_min=$minU%.2fs " +
      f"decode_over_binary=${minE / minB}%.2f udf_over_binary=${minU / minB}%.2f")
  }
}
