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
