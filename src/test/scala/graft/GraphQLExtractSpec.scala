package graft

import org.apache.spark.sql.functions._
import graft.extract.GraphQLExtract
import graft.gen.Synthetic.mix2

/** Oracle: expected values recomputed straight from the generator's
  * parameters (mirroring seoudi_extract_data.py semantics per SURVEY §2.2),
  * never by re-parsing the JSON. */
class GraphQLExtractSpec extends SparkTestBase {

  private val N = 300L

  private lazy val plucked = GraphQLExtract.pluckProducts(
    GraphQLExtract.syntheticDocs(spark, N, 4), "https://shop.example.com/en/")
    .collect().map(r => r.getAs[String]("sku") -> r).toMap

  test("P19 barcode concat: alt sku appended only when present and distinct") {
    for (id <- 0L until N) {
      val r = plucked(s"SKU-$id")
      val expected = (mix2(id, 7) % 3).abs match {
        case 0 => s"SKU-$id, ALT-$id"
        case _ => s"SKU-$id"
      }
      assert(r.getAs[String]("barcode") == expected, s"id=$id")
    }
  }

  test("P20 null-safe plucks: null brand -> '', categories padded with ''") {
    for (id <- 0L until N) {
      val r = plucked(s"SKU-$id")
      val expectedBrand =
        if ((mix2(id, 2) & 3) == 0) "" else s"Brand-${(mix2(id, 3) % 25).abs}"
      assert(r.getAs[String]("brand") == expectedBrand, s"id=$id brand")
      val nCats = (mix2(id, 1) % 12).abs.toInt
      for (i <- 1 to 9) {
        val expected =
          if (i <= nCats) s"Cat-${(mix2(id, 10 + i - 1) % 30).abs}" else ""
        assert(r.getAs[String](s"category_$i") == expected, s"id=$id cat$i")
      }
    }
  }

  test("P18 offer nulling: final==regular clears offer fields") {
    var offers = 0
    for (id <- 0L until N) {
      val r = plucked(s"SKU-$id")
      val hasOffer = (mix2(id, 5) & 3) == 0
      if (hasOffer) {
        offers += 1
        assert(r.getAs[String]("price_after").nonEmpty, s"id=$id")
        assert(r.getAs[String]("offer_start_date") == "2024-11-01")
        assert(r.getAs[String]("offer_end_date") == "2024-11-30")
      } else {
        assert(r.getAs[String]("price_after") == "", s"id=$id")
        assert(r.getAs[String]("offer_start_date") == "")
        assert(r.getAs[String]("offer_end_date") == "")
      }
      assert(r.getAs[String]("price_before").nonEmpty)
    }
    assert(offers > 0)
  }

  test("P22 url synthesis") {
    for (id <- 0L until 50L) {
      assert(plucked(s"SKU-$id").getAs[String]("url") ==
        s"https://shop.example.com/en/item-$id")
    }
  }

  test("G1 barcode explode: combined row plus per-barcode rows") {
    val products = GraphQLExtract.pluckProducts(
      GraphQLExtract.syntheticDocs(spark, 100, 4), "https://x/")
    val exploded = GraphQLExtract.withBarcodeRows(products)
    val multi = (0L until 100L).count(id => (mix2(id, 7) % 3).abs == 0)
    assert(exploded.count() == products.count() + 2 * multi)
    // every multi-barcode product contributes its combined row AND both parts
    val sample = (0L until 100L).find(id => (mix2(id, 7) % 3).abs == 0).get
    val rows = exploded.filter(col("sku") === s"SKU-$sample")
      .select("barcode").collect().map(_.getString(0)).toSet
    assert(rows == Set(s"SKU-$sample, ALT-$sample", s"SKU-$sample", s"ALT-$sample"))
  }

  test("S5 paginated list scan: nodes in drain order, count barrier detects a missing page") {
    import spark.implicits._
    // 2 categories x 3 pages x 2 nodes, total_count = 6 on every page
    def doc(cat: String, page: Int): String = {
      val nodes = (0 until 2).map(i =>
        s"""{"url_key":"$cat-p$page-$i","sku":"S$cat$page$i","name":"N"}""").mkString(",")
      s"""{"data":{"connection":{"total_count":6,"nodes":[$nodes]}}}"""
    }
    val pages = (for (c <- Seq("a", "b"); p <- 0 until 3) yield (c, p, doc(c, p)))
      .toDF("category", "page_no", "doc")
    val nodes = GraphQLExtract.listNodes(pages)
    assert(nodes.count() == 12)
    val keys = nodes.filter(col("category") === "a")
      .orderBy("page_no", "pos").select("url_key").collect().map(_.getString(0)).toSeq
    assert(keys == Seq("a-p0-0", "a-p0-1", "a-p1-0", "a-p1-1", "a-p2-0", "a-p2-1"))
    val auditFull = GraphQLExtract.paginationAudit(pages)
      .collect().map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(auditFull == Map("a" -> true, "b" -> true))
    // drop one page of category b -> barrier must flag it incomplete
    val torn = pages.filter(!(col("category") === "b" && col("page_no") === 1))
    val auditTorn = GraphQLExtract.paginationAudit(torn)
      .collect().map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(auditTorn == Map("a" -> true, "b" -> false))
  }

  test("Spinneys: brand-image probe, truthy-barcode gate, single sink row (spinneys:416-554)") {
    import spark.implicits._
    def doc(id: Long, sku: String, name: String, brand: Option[String]): String = {
      val b = brand.map(n => s"""{"name":"$n"}""").getOrElse("null")
      s"""{"data":{"product":{"id":$id,"sku":"$sku","name":"$name","brand":$b,
         |"thumbnail":{"url":"https://img/$id.jpg"},
         |"categories":[{"name":"C$id"}],
         |"price_range":{"maximum_price":{"final_price":{"value":10.5},
         |"regular_price":{"value":12.0}}}}}}""".stripMargin.replace("\n", "")
    }
    val docs = Seq(
      // (en, ar, slug, seq): normal w/ known brand, dup barcode (loses),
      // empty sku (gated), unknown brand, missing-image brand
      (doc(1, "B1", "P1", Some("Acme Co")), doc(1, "B1", "PA1", Some("اكمي")), "s1", 1L),
      (doc(2, "B1", "P2", Some("Acme Co")), null, "s2", 2L),
      (doc(3, "", "P3", Some("Acme Co")), null, "s3", 3L),
      (doc(4, "B4", "P4", Some("NoDir Brand")), null, "s4", 4L),
      (doc(5, "B5", "P5", None), null, "s5", 5L))
      .toDF("en_doc", "ar_doc", "slug", "__seq")
    // directory: "Acme Co" has an image (later fetch overwrites earlier —
    // last wins); "NoDir Brand" fetched without an image -> never enters
    val dim = GraphQLExtract.spinneysBrandDim(Seq(
      ("Acme Co", "https://img/old.png", 1L),
      ("Acme Co", "https://img/acme.png", 2L),
      ("NoDir Brand", null, 3L),
      ("", "https://img/empty.png", 4L)).toDF("name", "image_url", "fetch_seq"))
    val out = GraphQLExtract.spinneysSinkRows(
      GraphQLExtract.spinneysProduct(docs, "2024-11-10", dim))
      .collect().map(r => r.getString(r.fieldIndex("url")) -> r).toMap
    // gate: sku ''; dedup: B1 first-wins -> s1 kept, s2 dropped
    assert(out.keySet == Set("https://spinneys-egypt.com/en/s1",
      "https://spinneys-egypt.com/en/s4", "https://spinneys-egypt.com/en/s5"))
    val p1 = out("https://spinneys-egypt.com/en/s1")
    assert(p1.getString(p1.fieldIndex("brand_image_url")) == "https://img/acme.png")
    assert(p1.getString(p1.fieldIndex("brand_ar")) == "اكمي")
    assert(p1.getString(p1.fieldIndex("name_ar")) == "PA1")
    assert(p1.getString(p1.fieldIndex("price_before")) == "12.00")
    assert(p1.getString(p1.fieldIndex("price_after")) == "10.50")
    val p4 = out("https://spinneys-egypt.com/en/s4")
    assert(p4.getString(p4.fieldIndex("brand_image_url")) == "") // no dir image
    val p5 = out("https://spinneys-egypt.com/en/s5")
    assert(p5.getString(p5.fieldIndex("brand_en")) == "")
    assert(p5.getString(p5.fieldIndex("brand_image_url")) == "") // null brand
    assert(p5.getString(p5.fieldIndex("name_ar")) == "")         // ar fetch failed
  }
}
