package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.app.{CrawlEngine, MerchantSpec}

/** Engine-level RE-CRAWL WINDOW (J4b) over the deletable cuckoo seen gate:
  * with `recrawlAfterRounds = Some(w)`, a URL fetched in round r is blocked
  * by the seen gate while `round - w < r` and re-admitted once its entry
  * expires — IF the frontier rediscovers it (ingest append / link harvest).
  * A successful re-fetch re-stamps the hash with the new round, renewing the
  * window. Without the config the seen gate is the Bloom path and a fetched
  * URL never re-schedules, exactly as before.
  *
  * Uses the GraphQL (harvest-free) Spinneys merchant so each round's
  * schedule count is the direct observable of the gate: one drain round
  * fetches everything, then every later round's pending is exactly the
  * re-ingested rediscovery set. */
class CrawlEngineRecrawlSpec extends SparkTestBase {

  private val N = 60L
  private val Window = 2
  private val RunDate = "2024-11-10"

  private def freshDir(): String =
    Files.createTempDirectory("graft-recrawl").toString

  private def doc(id: Long, ar: Boolean): String = {
    val name = s"${if (ar) "AR " else ""}Prod $id"
    s"""{"data":{"product":{"id":$id,"sku":"R$id","name":"$name","brand":null,""" +
      s""""thumbnail":{"url":"https://img/rc$id.jpg"},"categories":[{"name":"C$id"}],""" +
      s""""price_range":{"maximum_price":{"final_price":{"value":10.50},"regular_price":{"value":12.00}}}}}}"""
  }
  private def url(id: Long): String = s"https://spinneys-egypt.com/en/item-$id"

  private def frontierIds(s: SparkSession, ids: Seq[Long]): DataFrame = {
    import s.implicits._
    ids.map(id => (s"cat${id % 2}", url(id), false, id))
      .toDF("category", "url", "is_processed", "discovered_seq")
  }
  private def frontier(s: SparkSession): DataFrame = frontierIds(s, 0L until N)
  private def pages(s: SparkSession): DataFrame = {
    import s.implicits._
    ((0L until N) ++ (100L until 130L)).flatMap { id =>
      Seq("en", "ar").map(lang => graft.model.Page(url(id),
        new java.sql.Timestamp(1700000000000L + id),
        doc(id, lang == "ar").getBytes("UTF-8"), "", lang))
    }.toDF()
  }
  private def brandDim(s: SparkSession): DataFrame = {
    import s.implicits._
    graft.extract.GraphQLExtract.spinneysBrandDim(
      Seq(("Brand 0", "https://img/b0.png", 0L)).toDF("name", "image_url", "fetch_seq"))
  }
  private def emptyRobots(s: SparkSession) = {
    import s.implicits._
    Seq.empty[(String, String, Boolean, Int)].toDF("host", "path_prefix", "allow", "crawl_delay_ms")
  }
  private def emptyBudgets(s: SparkSession) = {
    import s.implicits._
    Seq.empty[(String, Int)].toDF("host", "per_round")
  }

  private def mkEngine(dir: String, recrawl: Option[Int]): CrawlEngine =
    new CrawlEngine(spark, dir, runDate = RunDate, numPartitions = 4,
      defaultBudget = 10000, maxAttempts = 2,
      merchant = MerchantSpec.spinneys(brandDim(spark)),
      recrawlAfterRounds = recrawl)

  private def round(e: CrawlEngine): Long =
    e.runRound(pages(spark), emptyRobots(spark), emptyBudgets(spark))
  private def rediscover(e: CrawlEngine): Unit =
    e.ingestFrontierAppend(e.enrichSeeds(frontier(spark)))

  /** (round, crawl_order, url_norm) triples — the exactness surface. */
  private def schedule(e: CrawlEngine): Seq[(Int, Long, String)] =
    e.scheduleTable.read().get.select("round", "crawl_order", "url_norm")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2)))
      .sortBy(t => (t._1, t._2)).toSeq
  private def seenRows(e: CrawlEngine): Seq[(Long, Int)] =
    e.seenTable.read().get.select("url_hash", "seen_round")
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq

  test("expiry re-admits rediscovered URLs; a re-fetch re-stamps and renews the window") {
    val e = mkEngine(freshDir(), Some(Window))
    e.init(e.enrichSeeds(frontier(spark)))
    assert(round(e) == N)                      // round 1: everything fetched
    rediscover(e)
    assert(round(e) == 0L)                     // round 2: 1 > 2-w -> window active
    rediscover(e)
    assert(round(e) == N)                      // round 3: 1 <= 3-w -> expired, re-fetched
    rediscover(e)
    assert(round(e) == 0L)                     // round 4: re-stamped at 3 -> alive again
    // seen lineage: every hash exactly twice, at rounds 1 and 3
    val byHash = seenRows(e).groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(byHash.size == N.toInt)
    byHash.foreach { case (h, rs) => assert(rs == Seq(1, 3), s"hash=$h rounds=$rs") }
    // the schedule records both fetch generations with provenance
    val byRound = schedule(e).groupBy(_._1).view.mapValues(_.size).toMap
    assert(byRound == Map(1 -> N.toInt, 3 -> N.toInt))
    // the cuckoo sketch is CHECKPOINTED state, maintained per round — its
    // snapshot exists, carries parseable geometry, and the checkpoint
    // points at a committed snapshot
    val snap = e.sketchTable.currentSnapshot
    assert(snap.isDefined, "seen_sketch snapshot missing")
    assert(snap.get.lineageJson.matches("""sketch:b=\d+;cap=\d+;n=\d+;seen=\d+"""),
      s"sketch lineage: ${snap.get.lineageJson}")
    assert(e.readCheckpoint().get.sketch > 0)
    assert(e.sketchTable.readAt(e.readCheckpoint().get.sketch).isDefined)
  }

  test("streaming-ingested pre-seen hashes gate immediately and expire on schedule") {
    // The sketch only ever sees commit-time inserts (fetched hashes); hashes
    // arriving via ingestSeenAppend reach the sketch through the
    // uncovered-delta fold at round start. Without that fold they are
    // sketch-negative, bypass the exact verify join, and get re-fetched.
    val e = mkEngine(freshDir(), Some(Window))
    e.init(e.enrichSeeds(frontier(spark)))
    assert(round(e) == N)                                  // round 1
    // an externally-known seen set (a prior crawl's export) streams in:
    // batch C, never fetched by THIS engine, stamped with the current round
    val cIds = 100L until 130L
    def cFrontier = e.enrichSeeds(frontierIds(spark, cIds))
    e.ingestSeenAppend(cFrontier.select(col("url_hash")))
    e.ingestFrontierAppend(cFrontier)                      // rediscovered
    assert(round(e) == 0L, "ingested pre-seen URLs must not be re-fetched") // round 2
    e.ingestFrontierAppend(cFrontier)
    assert(round(e) == cIds.size.toLong)                   // round 3: stamp 1 expired
  }

  test("without a window, rediscovered URLs never re-schedule (Bloom path unchanged)") {
    val e = mkEngine(freshDir(), None)
    e.init(e.enrichSeeds(frontier(spark)))
    assert(round(e) == N)
    rediscover(e)
    assert(round(e) == 0L)
    rediscover(e)
    assert(round(e) == 0L)                     // round 3: no expiry without the config
    assert(e.seenTable.read().get.columns.toSeq == Seq("url_hash")) // schema untouched
  }

  test("kill between table commits mid-RE-CRAWL round resumes exactly under the cuckoo gate") {
    // untorn reference
    val ref = mkEngine(freshDir(), Some(Window))
    ref.init(ref.enrichSeeds(frontier(spark)))
    round(ref); rediscover(ref); round(ref); rediscover(ref); round(ref)
    // tear points: after the seen append (2: seen re-stamped, sketch and
    // checkpoint not) and after the sketch overwrite (8: sketch written,
    // checkpoint not — resume must read the CHECKPOINTED sketch snapshot,
    // not the torn CURRENT)
    Seq(2, 8).foreach { tearAt =>
      val dir = freshDir()
      val e = mkEngine(dir, Some(Window))
      e.init(e.enrichSeeds(frontier(spark)))
      round(e); rediscover(e); round(e); rediscover(e)
      e.crashAfterCommit = tearAt
      intercept[RuntimeException] { round(e) }
      e.crashAfterCommit = -1
      val resumed = mkEngine(dir, Some(Window)) // fresh engine object = restart
      assert(resumed.readCheckpoint().get.round == 2, s"tearAt=$tearAt")
      assert(round(resumed) == N, s"tearAt=$tearAt") // the re-crawl round replays
      assert(schedule(resumed) == schedule(ref), s"tearAt=$tearAt")
      assert(seenRows(resumed) == seenRows(ref), s"tearAt=$tearAt")
    }
  }
}
