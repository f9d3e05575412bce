package graft.tools

import org.apache.spark.sql.SparkSession

/** The driver's flagship smoke, reproduced: SparkEntry.entry(spark) must
  * return rows > 0 with the 34-column product schema. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    println(s"ENTRY rows=$n cols=${df.columns.length}")
    println("ENTRY first: " + df.orderBy("url").limit(1).collect().mkString)
    spark.stop()
  }
}
