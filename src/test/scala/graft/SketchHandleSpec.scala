package graft

import org.apache.spark.sql.functions._
import graft.seen.{CuckooFilter, SketchHandle, UrlSeen}

/** Focused spec for the r06 executor-pinned sketch transport (the engine's
  * re-crawl gate internals changed from the cogroup to zipPartitions
  * co-location): gate identity vs the exact anti-join AND vs the cogroup
  * transport, update identity vs UrlSeen.updateCuckooFilters, new-bucket
  * inserts, the loud delete-contract failure, and zip alignment at a bucket
  * count that does not divide the parallelism. */
class SketchHandleSpec extends SparkTestBase {

  private def hashed(from: Long, to: Long) =
    spark.range(from, to).select(xxhash64(col("id")).as("url_hash"))

  test("pinned zip gate == exact anti-join == cogroup gate (same filters)") {
    import spark.implicits._
    val seen = hashed(0, 3000)
    val frontier = hashed(2000, 5000)
      .withColumn("url", concat(lit("u"), col("url_hash")))
    val b = 7 // deliberately neither a divisor nor multiple of local cores
    val filters = UrlSeen.buildCuckooFilters(seen, "url_hash", 3000, b)
    val handle = SketchHandle.pin(filters, b, 3000 / b)
    try {
      val viaZip = SketchHandle.gate(frontier, handle, seen, "url_hash")
        .select("url_hash").as[Long].collect().sorted.toSeq
      val viaCogroup = UrlSeen.antiJoinWithCuckoo(frontier, filters, seen, "url_hash", b)
        .select("url_hash").as[Long].collect().sorted.toSeq
      val exact = UrlSeen.exactAntiJoin(frontier, seen, "url_hash")
        .select("url_hash").as[Long].collect().sorted.toSeq
      assert(viaZip == exact)
      assert(viaCogroup == exact)
      // gate output keeps all frontier columns (minus the internal bucket)
      assert(SketchHandle.gate(frontier, handle, seen, "url_hash").columns.toSeq ==
        Seq("url_hash", "url"))
    } finally handle.unpersist()
  }

  test("zip update == updateCuckooFilters: deletes + inserts + new buckets") {
    import spark.implicits._
    val seen = hashed(0, 2000)
    val b = 5
    val cap = 2000L / 5
    val filters = UrlSeen.buildCuckooFilters(seen, "url_hash", 2000, b)
    val deletes = hashed(0, 300)            // subset of inserted
    val inserts = hashed(5000, 5400)        // fresh keys, may open new buckets
    val handle = SketchHandle.pin(filters, b, cap)
    val updated = SketchHandle.update(handle, "url_hash",
      deletes = Some(deletes), inserts = Some(inserts))
    try {
      val viaDf = UrlSeen.updateCuckooFilters(filters, "url_hash", b, cap,
          deletes = Some(deletes), inserts = Some(inserts))
        .collect().map(r => r.getInt(0) -> r.getAs[Array[Byte]](1)).toMap
      val viaZip = updated.rdd.collect().toMap
      assert(viaZip.keySet == viaDf.keySet)
      // membership-equivalent per bucket over every touched key (byte
      // equality is not guaranteed — partial-merge order differs — but the
      // no-false-negative membership contract must agree)
      val keyHashes = hashed(0, 2000).unionByName(hashed(5000, 5400))
        .as[Long].collect()
      for ((bucket, zipBytes) <- viaZip) {
        val fz = CuckooFilter.deserialize(zipBytes)
        val fd = CuckooFilter.deserialize(viaDf(bucket))
        keyHashes.foreach { h =>
          assert(fz.mightContain(h) == fd.mightContain(h),
            s"bucket $bucket disagrees on $h")
        }
      }
    } finally { handle.unpersist(); updated.unpersist() }
  }

  test("delete targeting a bucket with no filter row fails loud") {
    val seen = hashed(0, 50)
    val b = 4
    val filters = UrlSeen.buildCuckooFilters(seen, "url_hash", 50, b)
    // drop one bucket's row entirely, then delete keys that land in it
    val present = filters.collect().map(_.getInt(0)).toSet
    assert(present.nonEmpty)
    val victim = present.head
    val crippled = filters.filter(col("__bucket") =!= victim)
    val deletesAll = hashed(0, 50) // some land in the removed bucket
    val handle = SketchHandle.pin(crippled, b, 50)
    try {
      val e = intercept[org.apache.spark.SparkException] {
        SketchHandle.update(handle, "url_hash",
          deletes = Some(deletesAll), inserts = None).rdd.count()
      }
      assert(e.getMessage.contains("no filter row") ||
        Option(e.getCause).exists(_.getMessage.contains("no filter row")))
    } finally handle.unpersist()
  }

  test("empty frontier and empty update are exact no-ops") {
    import spark.implicits._
    val seen = hashed(0, 500)
    val b = 3
    val filters = UrlSeen.buildCuckooFilters(seen, "url_hash", 500, b)
    val handle = SketchHandle.pin(filters, b, 500)
    try {
      val empty = Seq.empty[Long].toDF("url_hash")
      assert(SketchHandle.gate(empty, handle, seen, "url_hash").count() == 0L)
      assert(SketchHandle.update(handle, "url_hash", None, None) eq handle)
    } finally handle.unpersist()
  }
}
