package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.app.{CrawlEngine, MerchantSpec}

/** Spinneys end-to-end (VERDICT r02 #1): catalog frontier + the DEALS second
  * frontier (spinneys_extract_data.py:557-776) through the engine, with:
  *  - the brand-image broadcast probe populated from a directory dim (:445);
  *  - the truthy-barcode gate (:510) and run-global processed_barcodes set
  *    spanning BOTH frontiers (a deal product whose barcode sank in the
  *    catalog never sinks again);
  *  - the URL-seen gate spanning both frontiers (a deal slug already crawled
  *    in the catalog is skipped — the reference refetches but its write is
  *    suppressed by the barcode set: same observable output, fewer fetches);
  *  - INDEPENDENT resume cursors: a kill between the catalog drain and the
  *    deals drain, or mid-deals-round, resumes exactly. */
class CrawlEngineSpinneysSpec extends SparkTestBase {

  private val CatalogN = 100L
  private val RunDate = "2024-11-10"

  // deals frontier: 80..99 overlap the catalog (url-seen), 100..119 are new;
  // of the new ones 110..119 reuse catalog barcodes (barcode gate)
  private def dealsIds: Seq[Long] = (80L until 120L)
  private def sku(id: Long): String =
    if (id % 13 == 0) "" // truthy gate (:510)
    else s"S${id % 110}" // 110..119 -> S0..S9, already sunk by the catalog
  private def brandName(id: Long): Option[String] =
    if (id % 4 == 3) None else Some(s"Brand ${id % 6}")
  private def dimHasImage(b: String): Boolean = b != "Brand 5"

  private def doc(id: Long, ar: Boolean): String = {
    val name = s"${if (ar) "AR " else ""}Prod $id"
    val brand = brandName(id).map(b => s"""{"name":"${if (ar) "AB " else ""}$b"}""").getOrElse("null")
    s"""{"data":{"product":{"id":$id,"sku":"${sku(id)}","name":"$name",""" +
      s""""brand":$brand,"thumbnail":{"url":"https://img/sp$id.jpg"},""" +
      s""""categories":[{"name":"C$id"}],""" +
      s""""price_range":{"maximum_price":{"final_price":{"value":10.50},"regular_price":{"value":12.00}}}}}}"""
  }

  private def url(id: Long): String = s"https://spinneys-egypt.com/en/item-$id"

  private def brandDim(s: SparkSession): DataFrame = {
    import s.implicits._
    graft.extract.GraphQLExtract.spinneysBrandDim(
      (0 until 6).map(i => (s"Brand $i",
        if (dimHasImage(s"Brand $i")) s"https://img/b$i.png" else null, i.toLong))
        .toDF("name", "image_url", "fetch_seq"))
  }

  private def frontier(s: SparkSession, ids: Seq[Long]): DataFrame = {
    import s.implicits._
    ids.map(id => (s"cat${id % 2}", url(id), false, id))
      .toDF("category", "url", "is_processed", "discovered_seq")
  }

  private def pages(s: SparkSession): DataFrame = {
    import s.implicits._
    (0L until 120L).flatMap { id =>
      Seq("en", "ar").map(lang => graft.model.Page(url(id),
        new java.sql.Timestamp(1700000000000L + id),
        doc(id, lang == "ar").getBytes("UTF-8"), "", lang))
    }.toDF()
  }

  private def emptyRobots(s: SparkSession) = {
    import s.implicits._
    Seq.empty[(String, String, Boolean, Int)].toDF("host", "path_prefix", "allow", "crawl_delay_ms")
  }
  private def emptyBudgets(s: SparkSession) = {
    import s.implicits._
    Seq.empty[(String, Int)].toDF("host", "per_round")
  }

  private def mkEngine(dir: String): CrawlEngine =
    new CrawlEngine(spark, dir, runDate = RunDate, numPartitions = 4,
      defaultBudget = 10000, maxAttempts = 2,
      merchant = MerchantSpec.spinneys(brandDim(spark)))

  /** Expected kept ids: catalog 0..99 then deals-new 100..109, truthy sku,
    * first id per barcode wins across BOTH frontiers. */
  private def expectedIds: Seq[Long] = {
    val seen = scala.collection.mutable.Set.empty[String]
    val kept = Vector.newBuilder[Long]
    ((0L until CatalogN) ++ dealsIds.filter(_ >= CatalogN)).foreach { id =>
      val b = sku(id)
      if (b.nonEmpty && !seen.contains(b)) { seen += b; kept += id }
    }
    kept.result()
  }

  private def productRows(e: CrawlEngine): Map[Long, Map[String, String]] =
    e.productsTable.read().get.collect().map { r =>
      val m = graft.model.Product.sinkOrder.map(c => c -> r.getAs[String](c)).toMap
      "item-(\\d+)$".r.findFirstMatchIn(m("url")).get.group(1).toLong -> m
    }.toMap

  private lazy val fullRun: CrawlEngine = {
    val e = mkEngine(Files.createTempDirectory("graft-spinneys").toString)
    e.init(e.enrichSeeds(frontier(spark, 0L until CatalogN)),
      Some(e.enrichSeeds(frontier(spark, dealsIds))))
    e.run(pages(spark), emptyRobots(spark), emptyBudgets(spark))
    e
  }

  test("catalog + deals drain: barcode gate spans frontiers, brand probe populated") {
    val rows = productRows(fullRun)
    assert(rows.keySet == expectedIds.toSet,
      s"missing=${expectedIds.toSet -- rows.keySet} extra=${rows.keySet -- expectedIds.toSet}")
    rows.foreach { case (id, m) =>
      assert(m("merchant") == "Spinneys")
      assert(m("barcode") == sku(id))
      assert(m("name_en") == s"Prod $id" && m("name_ar") == s"AR Prod $id", s"id=$id")
      assert(m("price_before") == "12.00" && m("price_after") == "10.50")
      val wantImg = brandName(id) match {
        case Some(b) if dimHasImage(b) => s"https://img/b${id % 6}.png"
        case _ => ""
      }
      assert(m("brand_image_url") == wantImg, s"id=$id brand=${brandName(id)}")
      assert(m("category_one_eng") == s"C$id" && m("category_two_eng") == "")
    }
  }

  test("schedule carries frontier provenance; deal slugs seen in catalog are never refetched") {
    val sched = fullRun.scheduleTable.read().get
      .select("frontier", "url_norm").collect()
      .map(r => (r.getString(0), "item-(\\d+)$".r.findFirstMatchIn(r.getString(1)).get.group(1).toLong))
    val catalogIds = sched.filter(_._1 == "catalog").map(_._2).toSet
    val dealIds = sched.filter(_._1 == "deals").map(_._2).toSet
    assert(catalogIds == (0L until CatalogN).toSet)
    // 80..99 were crawled by the catalog -> the deals round seen-gates them
    assert(dealIds == (100L until 120L).toSet, s"deals scheduled: $dealIds")
  }

  test("kill between catalog and deals drains resumes deals independently and exactly") {
    val dir = Files.createTempDirectory("graft-spinneys-resume").toString
    val e1 = mkEngine(dir)
    e1.init(e1.enrichSeeds(frontier(spark, 0L until CatalogN)),
      Some(e1.enrichSeeds(frontier(spark, dealsIds))))
    var last = -1L
    while (last != 0) last = e1.runRound(pages(spark), emptyRobots(spark), emptyBudgets(spark))
    // "kill" after the catalog drain: a fresh engine resumes; the deals
    // cursor still points at the init snapshot
    val e2 = mkEngine(dir)
    var lastD = -1L
    while (lastD != 0)
      lastD = e2.runRound(pages(spark), emptyRobots(spark), emptyBudgets(spark), deals = true)
    assert(productRows(e2) == productRows(fullRun))
  }

  test("torn deals round (kill between commits) resumes exactly, no duplication") {
    val dir = Files.createTempDirectory("graft-spinneys-torn").toString
    val e1 = mkEngine(dir)
    e1.init(e1.enrichSeeds(frontier(spark, 0L until CatalogN)),
      Some(e1.enrichSeeds(frontier(spark, dealsIds))))
    var last = -1L
    while (last != 0) last = e1.runRound(pages(spark), emptyRobots(spark), emptyBudgets(spark))
    // tear the first deals round after the barcode-seen commit (#7 — the
    // gate table this merchant adds) and after products (#3)
    Seq(3, 7).foreach { tearAt =>
      e1.crashAfterCommit = tearAt
      intercept[RuntimeException] {
        e1.runRound(pages(spark), emptyRobots(spark), emptyBudgets(spark), deals = true)
      }
      e1.crashAfterCommit = -1
    }
    val e2 = mkEngine(dir)
    var lastD = -1L
    while (lastD != 0)
      lastD = e2.runRound(pages(spark), emptyRobots(spark), emptyBudgets(spark), deals = true)
    assert(productRows(e2) == productRows(fullRun))
    import spark.implicits._
    assert(e2.barcodeSeenTable.read().get.as[String].collect().toSet ==
      fullRun.barcodeSeenTable.read().get.as[String].collect().toSet)
  }
}
