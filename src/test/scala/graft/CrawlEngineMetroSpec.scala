package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.app.{CrawlEngine, MerchantSpec}
import graft.gen.Synthetic

/** Full engine drain on the METRO merchant wiring: same scheduler, seen
  * gate, snapshot state — merchant-specific page key, projection, and the
  * reference's extraction-failure path (missing ld+json island = NameError,
  * metro:116-182): those URLs produce no product, are NOT marked seen, and
  * retry until quarantine. */
class CrawlEngineMetroSpec extends SparkTestBase {

  private val N = 150L
  private val MaxAttempts = 2
  private val RunDate = "2024-11-10"

  private lazy val engine: CrawlEngine = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-metro").toString
    val e = new CrawlEngine(spark, dir, runDate = RunDate,
      numPartitions = 4, defaultBudget = 10000, maxAttempts = MaxAttempts,
      merchant = MerchantSpec.metro)
    val raw = spark.range(0, N, 1, 4).map { idBoxed =>
      val id: Long = idBoxed
      (s"metro-cat${id % 5}", Synthetic.mUrl(id, "en"), false, id)
    }.toDF("category", "url", "is_processed", "discovered_seq")
    e.init(e.enrichSeeds(raw))
    val pages = Synthetic.metroPages(spark, N, 4).toDF()
    val robots = Seq.empty[(String, String, Boolean, Int)]
      .toDF("host", "path_prefix", "allow", "crawl_delay_ms")
    val budgets = Seq.empty[(String, Int)].toDF("host", "per_round")
    var last = -1L
    var r = 0
    while (last != 0 && r < 20) { last = e.runRound(pages, robots, budgets); r += 1 }
    e
  }

  private def idOf(url: String): Long =
    "metro-item-(\\d+)".r.findFirstMatchIn(url).get.group(1).toLong

  test("products byte-identical to the Metro oracle; NameError urls yield none") {
    val got = engine.productsTable.read().get.collect().map { r =>
      val vals = (0 until r.length).map(i => Option(r.getString(i)).getOrElse("<NULL>"))
      idOf(r.getAs[String]("url")) -> vals
    }.toMap
    var checked = 0
    (0L until N).foreach { id =>
      val want = graft.oracle.MetroOracle.product(id, arMissing = false, RunDate)
      (want, got.get(id)) match {
        case (None, None) => // extraction-failure path: correctly no product
        case (Some(w), Some(g)) =>
          w.zip(g).zipWithIndex.foreach { case ((we, ge), i) =>
            assert(we == ge, s"id=$id col=${graft.model.Product.sinkOrder(i)}")
          }
          checked += 1
        case other => fail(s"id=$id presence mismatch: oracle=${want.isDefined} got=${got.contains(id)}")
      }
    }
    assert(checked > 100, s"only $checked products checked")
  }

  test("extraction failures are not seen, retry, and quarantine at maxAttempts") {
    import spark.implicits._
    val failedIds = (0L until N).filter(!Synthetic.mHasLd(_)).toSet
    assert(failedIds.nonEmpty, "corpus needs NameError cases")
    val quarantined = engine.quarantineTable.read().get
      .select("url").collect().map(r => idOf(r.getString(0))).toSet
    assert(quarantined == failedIds, s"quarantine mismatch")
    // quarantined rows carry attempt == maxAttempts
    val attempts = engine.quarantineTable.read().get
      .select("attempt").collect().map(_.getInt(0)).toSet
    assert(attempts == Set(MaxAttempts))
    // seen = exactly the successful extractions
    val seen = engine.seenTable.read().get.as[Long].collect().toSet
    val wantSeen = (0L until N).filter(Synthetic.mHasLd(_))
      .map(id => graft.util.Hashing.xxhash64(graft.url.UrlCanon.canonicalize(Synthetic.mUrl(id, "en"))))
      .toSet
    assert(seen == wantSeen)
  }
}
