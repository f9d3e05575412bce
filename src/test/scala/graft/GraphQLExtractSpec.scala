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
}
