package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.app.{CrawlEngine, MerchantSpec}

/** Full engine drain on the SEOUDI merchant wiring (VERDICT r02 #5): pages
  * are GraphQL detail documents keyed by (url, lang), so retry/backoff (O4,
  * seoudi:38-46), the seen gate, the multi-round budget drain (F2 resume
  * semantics as snapshot cursors) and the RUN-GLOBAL processed_barcodes set
  * (seoudi:20,359) all run through CrawlEngine.runRound for the GraphQL
  * path. Products are asserted byte-identical to a straight-line oracle of
  * seoudi_extract_data.py:275-445. */
class CrawlEngineSeoudiSpec extends SparkTestBase {

  private val N = 120L
  private val Budget = 40 // one host -> 3+ rounds; exercises the cross-round gate
  private val MaxAttempts = 2
  private val RunDate = "2024-11-10"

  // ---- deterministic GraphQL corpus ----
  private def isFailure(id: Long): Boolean = id % 9 == 0 // data.product null
  private def arMissing(id: Long): Boolean = id % 5 == 0 // AR fetch failed
  private def g(id: Long): Long = id - id % 2            // adjacent ids share a sku
  private def hasAlt(id: Long): Boolean = g(id) % 3 == 0
  private def rc(id: Long): Long = (id * 37 % 5000) + 1000
  private def noOffer(id: Long): Boolean = id % 3 == 0
  private def fc(id: Long): Long = if (noOffer(id)) rc(id) else rc(id) - 50
  private def nCats(id: Long): Int = (id % 4).toInt
  private def brandMissing(id: Long): Boolean = id % 4 == 3

  private def doc(id: Long, ar: Boolean): String =
    if (isFailure(id)) """{"data":{"product":null}}"""
    else {
      val pfx = if (ar) "Q" else "C"
      val cats = (0 until nCats(id)).map(i => s"""{"name":"$pfx$id-$i"}""").mkString("[", ",", "]")
      val brand =
        if (brandMissing(id)) "null"
        else s"""{"name":"${if (ar) "AB " else ""}Brand${id % 7}"}"""
      val attrs =
        if (hasAlt(id)) s"""[{"key":"alternative_skus","value":"A${g(id)}"}]""" else "[]"
      s"""{"data":{"product":{"id":$id,"sku":"S${g(id)}","name":"${if (ar) "AR " else ""}Item $id",""" +
        s""""url_key":"item-$id","special_from_date":"2024-11-01","special_to_date":"2024-11-30",""" +
        s""""brand":$brand,"thumbnail":{"url":"https://img/$id.jpg"},"categories":$cats,""" +
        s""""price_range":{"maximum_price":{"final_price":{"value":${fc(id) / 100}.${"%02d".format(fc(id) % 100)}},""" +
        s""""regular_price":{"value":${rc(id) / 100}.${"%02d".format(rc(id) % 100)}}}},"attributes":$attrs}}}"""
    }

  private def url(id: Long): String = s"https://seoudisupermarket.com/en/item-$id"

  /** Straight-line oracle of the projection (seoudi:275-399) for one id. */
  private def expectedProduct(id: Long): Seq[String] = {
    def money(c: Long): String = s"${c / 100}.${"%02d".format(c % 100)}"
    val barcode = if (hasAlt(id)) s"S${g(id)}, A${g(id)}" else s"S${g(id)}"
    val catsEn = (1 to 9).map(i => if (i - 1 < nCats(id)) s"C$id-${i - 1}" else "")
    val catsAr = (1 to 9).map(i =>
      if (!arMissing(id) && i - 1 < nCats(id)) s"Q$id-${i - 1}" else "")
    Seq("Seoudi", id.toString,
      if (arMissing(id) || brandMissing(id)) "" else s"AB Brand${id % 7}",
      if (brandMissing(id)) "" else s"Brand${id % 7}",
      barcode,
      if (arMissing(id)) "" else s"AR Item $id",
      s"Item $id") ++ catsEn ++ catsAr ++ Seq(
      money(rc(id)),
      if (noOffer(id)) "" else money(fc(id)),
      if (noOffer(id)) "" else "2024-11-01",
      if (noOffer(id)) "" else "2024-11-30",
      url(id), "", s"https://img/$id.jpg", "Website", RunDate)
  }

  /** The run-global gate (seoudi:359-361): ids ascend in crawl order across
    * rounds, first id of each barcode sinks; sink = combined row + one row
    * per split barcode, unconditionally (:399-445). */
  private def expectedSinkRows(): Seq[Seq[String]] = {
    val seen = scala.collection.mutable.Set.empty[String]
    val rows = Vector.newBuilder[Seq[String]]
    (0L until N).foreach { id =>
      if (!isFailure(id)) {
        val p = expectedProduct(id)
        val barcode = p(4)
        if (!seen.contains(barcode)) {
          seen += barcode
          rows += p
          barcode.split(", ").foreach(b => rows += p.updated(4, b))
        }
      }
    }
    rows.result()
  }

  private lazy val engine: CrawlEngine = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-seoudi").toString
    val e = new CrawlEngine(spark, dir, runDate = RunDate,
      numPartitions = 4, defaultBudget = Budget, maxAttempts = MaxAttempts,
      merchant = MerchantSpec.seoudi)
    // driver-local corpus (tiny): no distributed closures over the spec
    val raw = (0L until N).map(id => (s"cat${id % 3}", url(id), false, id))
      .toDF("category", "url", "is_processed", "discovered_seq")
    e.init(e.enrichSeeds(raw))
    val pages = (0L until N).flatMap { id =>
      val en = Seq(("en", doc(id, ar = false)))
      val ar = if (arMissing(id)) Nil else Seq(("ar", doc(id, ar = true)))
      (en ++ ar).map { case (lang, d) =>
        graft.model.Page(url(id), new java.sql.Timestamp(1700000000000L + id),
          d.getBytes("UTF-8"), "", lang)
      }
    }.toDF()
    val robots = Seq.empty[(String, String, Boolean, Int)]
      .toDF("host", "path_prefix", "allow", "crawl_delay_ms")
    val budgets = Seq.empty[(String, Int)].toDF("host", "per_round")
    var last = -1L
    var r = 0
    while (last != 0 && r < 20) { last = e.runRound(pages, robots, budgets); r += 1 }
    assert(r > 3, s"budget $Budget over $N urls must take several rounds, took $r")
    e
  }

  test("products byte-identical to the straight-line oracle (incl. run-global barcode gate)") {
    val got = engine.productsTable.read().get.collect()
      .map(r => (0 until r.length).map(i => Option(r.getString(i)).getOrElse("<NULL>")).toSeq)
      .sortBy(_.mkString("")).toSeq
    val want = expectedSinkRows().sortBy(_.mkString(""))
    assert(got.size == want.size, s"got ${got.size} rows, want ${want.size}")
    got.zip(want).foreach { case (gr, wr) =>
      gr.zip(wr).zipWithIndex.foreach { case ((ge, we), i) =>
        assert(ge == we, s"col=${graft.model.Product.sinkOrder(i)} got=$gr want=$wr")
      }
    }
  }

  test("null-product docs retry then quarantine; seen = successful ids exactly") {
    import spark.implicits._
    val failedIds = (0L until N).filter(isFailure).toSet
    val quarantined = engine.quarantineTable.read().get
      .select("url").collect()
      .map(r => "item-(\\d+)$".r.findFirstMatchIn(r.getString(0)).get.group(1).toLong).toSet
    assert(quarantined == failedIds)
    assert(engine.quarantineTable.read().get
      .select("attempt").collect().map(_.getInt(0)).toSet == Set(MaxAttempts))
    val seen = engine.seenTable.read().get.as[Long].collect().toSet
    val wantSeen = (0L until N).filterNot(isFailure)
      .map(id => graft.util.Hashing.xxhash64(graft.url.UrlCanon.canonicalize(url(id)))).toSet
    assert(seen == wantSeen)
  }

  test("barcode_seen table holds exactly the sunk combined barcodes") {
    val got = engine.barcodeSeenTable.read().get
      .collect().map(_.getString(0)).toSet
    val want = (0L until N).filterNot(isFailure)
      .map(id => if (hasAlt(id)) s"S${g(id)}, A${g(id)}" else s"S${g(id)}").toSet
    assert(got == want)
  }
}
