package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Minimal repro harness for the halving self-join analyzer issue. */
object DebugCC {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val nodes = (1L to 10L).toDF("doc_id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L), (6L, 7L), (5L, 7L))
      .toDF("a", "b")
    try {
      val got = graft.graph.ConnectedComponents.components(nodes, edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      println(s"OK $got")
    } catch {
      case e: Throwable =>
        println("FAILED: " + e)
        e.printStackTrace()
    }
    spark.stop()
  }
}
