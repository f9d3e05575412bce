package graft

import org.apache.spark.sql.functions._
import graft.gen.Synthetic
import graft.seen.UrlSeen

class UrlSeenSpec extends SparkTestBase {

  test("bloom+exact anti-join identical to plain exact anti-join (no false negatives)") {
    import spark.implicits._
    val frontier = Synthetic.frontier(spark, 1200, 4).toDF()
    val seen = frontier.filter(col("url_hash") % 3 === 0).select("url_hash")
    val seenN = seen.count()
    val viaBloom = UrlSeen.antiJoin(frontier, seen, "url_hash", seenN, 0.05)
      .select("url_hash").as[Long].collect().sorted.toSeq
    val exact = UrlSeen.exactAntiJoin(frontier, seen, "url_hash")
      .select("url_hash").as[Long].collect().sorted.toSeq
    assert(viaBloom == exact)
  }

  test("empty seen table passes everything through") {
    import spark.implicits._
    val frontier = Synthetic.frontier(spark, 100, 2).toDF()
    val empty = Seq.empty[Long].toDF("url_hash")
    assert(UrlSeen.antiJoin(frontier, empty, "url_hash", 0).count() == frontier.count())
  }

  test("PARTITIONED bloom gate identical to plain exact anti-join") {
    import spark.implicits._
    val frontier = Synthetic.frontier(spark, 1200, 4).toDF()
    val seen = frontier.filter(col("url_hash") % 3 === 0).select("url_hash")
    val seenN = seen.count()
    val viaPart = UrlSeen.antiJoin(frontier, seen, "url_hash", seenN, 0.05,
        forcePartitioned = true)
      .select("url_hash").as[Long].collect().sorted.toSeq
    val exact = UrlSeen.exactAntiJoin(frontier, seen, "url_hash")
      .select("url_hash").as[Long].collect().sorted.toSeq
    assert(viaPart == exact)
    spark.catalog.clearCache()
  }

  test("partitioned blooms: per-bucket executor aggregation, no driver merge, prunes well") {
    import graft.seen.BloomAgg
    import org.apache.spark.util.sketch.BloomFilter
    val seen = spark.range(0, 20000).select(xxhash64(col("id")).as("url_hash"))
    val blooms = seen
      .repartition(8, pmod(col("url_hash"), lit(8)).cast("int"))
      .groupBy(pmod(col("url_hash"), lit(8)).cast("int").as("bucket"))
      .agg(BloomAgg.bloomAgg(col("url_hash"), 20000 / 8, 0.03).as("bloom"))
      .collect()
    assert(blooms.length == 8)
    val filters = blooms.map(r => r.getInt(0) ->
      BloomFilter.readFrom(new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))).toMap
    // no false negatives: every seen hash hits its bucket's filter
    val seenHashes = seen.collect().map(_.getLong(0))
    seenHashes.foreach { h =>
      val b = ((h % 8) + 8) % 8
      assert(filters(b.toInt).mightContainLong(h), s"false negative for $h")
    }
    // prunes: fresh hashes mostly rejected by their bucket's filter
    val fresh = (500000L until 501000L).map(graft.gen.Synthetic.mix)
    val falsePos = fresh.count(h => filters((((h % 8) + 8) % 8).toInt).mightContainLong(h))
    assert(falsePos < 100, s"false-positive rate too high: $falsePos/1000")
  }

  test("bloom prefilter actually prunes: most unseen rows skip the join") {
    // statistical: with fpp=3%, >90% of truly-new hashes must be rejected by
    // the sketch (mightContain=false)
    import spark.implicits._
    val seen = spark.range(0, 10000).select(xxhash64(col("id")).as("url_hash"))
    val bloom = UrlSeen.bloomOf(seen, "url_hash", 10000, 0.03)
    val fresh = (100000L until 101000L).map(graft.gen.Synthetic.mix)
    val falsePos = fresh.count(bloom.mightContainLong)
    assert(falsePos < 100, s"false-positive rate too high: $falsePos/1000")
  }
}
