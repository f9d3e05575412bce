package graft.tools

import org.apache.spark.sql.SparkSession

/** Materialize q_ngram_jaccard and print its DF-cap observation (the
  * no-silent-caps metric added in r06): dropped vs total trigram
  * occurrences at the given SF. Usage: runMain graft.tools.DebugNgramCap [sfDir] */
object DebugNgramCap {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = graft.SparkEntry.queries("q_ngram_jaccard")(spark, sfDir)
      .queryExecution.toRdd.count()
    spark.catalog.clearCache()
    val r = graft.queries.GraftQueries.ngramCapStats(spark, sfDir).head
    val dropped = r.getLong(0)
    val total = r.getLong(1)
    println(f"RESULT rows=$n dropped_trigram_occurrences=$dropped " +
      f"total_trigram_occurrences=$total fraction=${dropped.toDouble / total}%.4f")
    spark.stop()
  }
}
