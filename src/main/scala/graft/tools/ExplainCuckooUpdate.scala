package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Plan audit for `UrlSeen.updateCuckooFilters` (BASELINE.md "Cuckoo URL-seen
  * gate"): the incremental update must NOT exchange the ∝|seen| filter
  * binaries — only the window's key lists may shuffle. Dumps the formatted
  * physical plan; the invariant to eyeball is zero Exchange nodes between the
  * InMemoryTableScan of the filters and the joins (the window-list sides are
  * repartitioned to the filters' HashPartitioning(__bucket, buckets), so both
  * joins are co-partitioned). The first measured version of this plan moved
  * 50.7 MiB of filter bytes per update at 16M seen; the co-partitioned one
  * moves 3.2 MiB (DebugCuckooScale). */
object ExplainCuckooUpdate {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.seen.UrlSeen
    val seenN = 1000000L
    def hashed(from: Long, to: Long) =
      spark.range(from, to).select(xxhash64(col("id")).as("url_hash"))
    val seen = hashed(0, seenN)
    val expired = spark.range(0, seenN).filter(col("id") % 100 === 0)
      .select(xxhash64(col("id")).as("url_hash"))
    val fresh = hashed(seenN, seenN + seenN / 100)
    val b = UrlSeen.bucketCount(seenN)
    val filters = UrlSeen.buildCuckooFilters(seen, "url_hash", seenN, b).persist()
    filters.count()
    val updated = UrlSeen.updateCuckooFilters(filters, "url_hash", b, seenN / b,
      deletes = Some(expired), inserts = Some(fresh))
    updated.explain("formatted")
    spark.stop()
  }
}
