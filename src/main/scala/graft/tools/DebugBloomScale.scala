package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale evidence for the partitioned URL-seen gate: a 16M-entry seen set
  * (above the broadcast threshold) against a 2M frontier, half pre-seen.
  * Prints per-bucket filter sizes (the per-task deserialization cost — the
  * number that must stay bounded as `seen` grows 1000×) and verifies the
  * partitioned result equals the exact anti-join. */
object DebugBloomScale {
  def main(args: Array[String]): Unit = {
    val seenN = args.headOption.map(_.toLong).getOrElse(16L * 1000 * 1000)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.seen.{BloomAgg, UrlSeen}

    val seen = spark.range(0, seenN).select(xxhash64(col("id")).as("url_hash"))
    val frontier = spark.range(seenN - 1000000, seenN + 1000000)
      .select(xxhash64(col("id")).as("url_hash"))

    // per-bucket filter sizes: what one task holds at a time
    val b = UrlSeen.bucketCount(seenN)
    val sizes = seen
      .repartition(b, pmod(col("url_hash"), lit(b)).cast("int"))
      .groupBy(pmod(col("url_hash"), lit(b)).cast("int").as("bucket"))
      .agg(BloomAgg.bloomAgg(col("url_hash"), seenN / b, 0.03).as("bloom"))
      .select(col("bucket"), octet_length(col("bloom")).as("bytes"))
      .agg(count(lit(1)).as("buckets"), min(col("bytes")).as("min_b"),
        max(col("bytes")).as("max_b"), sum(col("bytes")).as("total_b"))
      .head
    println(s"RESULT buckets=${sizes.getLong(0)} per_bucket_bytes=[${sizes.getInt(1)}..${sizes.getInt(2)}] " +
      s"total_bytes=${sizes.getLong(3)} (one bucket per task vs the whole ${sizes.getLong(3)} on every executor for a broadcast)")

    val t0 = System.nanoTime()
    val part = UrlSeen.antiJoin(frontier, seen, "url_hash", seenN, 0.03).count()
    val dt = (System.nanoTime() - t0) / 1e9
    val exact = UrlSeen.exactAntiJoin(frontier, seen, "url_hash").count()
    println(f"RESULT partitioned=$part exact=$exact equal=${part == exact} time=$dt%.1fs")
    spark.stop()
  }
}
