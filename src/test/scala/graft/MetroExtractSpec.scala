package graft

import org.apache.spark.sql.functions._
import graft.extract.{ExtractKernel, Extractors}
import graft.gen.Synthetic
import graft.html.MiniHtml

/** Byte-identity suite for the Metro pipeline (P3 xpath name, P15 ld+json
  * with the reference's `.get(k, default)` sentinels, P16/P17 prices,
  * metro's offer_start rule). The oracle is computed straight-line from the
  * generator parameters, mirroring
  * /root/reference/scripts/MetroMarkets/metro_markets_extract_product_data.py
  * lines 90-169 — NOT by re-running the kernel. */
class MetroExtractSpec extends SparkTestBase {

  private val N = 260L
  private val RunDate = "2024-11-10"

  private def oracle(id: Long, arMissing: Boolean): Option[Seq[String]] =
    graft.oracle.MetroOracle.product(id, arMissing, RunDate)

  private lazy val products: Map[Long, Seq[String]] = {
    val pages = Synthetic.metroPages(spark, N, 4).toDF()
      .withColumn("id", regexp_extract(col("url"), "metro-item-(\\d+)", 1).cast("long"))
      .filter(!(col("lang") === "ar" && col("id") % 13 === 0))
      .drop("id")
      .withColumn("url_key", regexp_replace(col("url"), "/ar/product/", "/product/"))
    val pivoted = Extractors.pivotLangs(Extractors.withPageFields(pages), "url_key")
    Extractors.metroProduct(pivoted, RunDate)
      .collect()
      .map { r =>
        val vals = (0 until r.length).map(i => Option(r.getString(i)).getOrElse("<NULL>"))
        val id = "metro-item-(\\d+)".r.findFirstMatchIn(r.getAs[String]("url")).get.group(1).toLong
        id -> vals
      }.toMap
  }

  test("every 34-column field byte-identical to the straight-line reference oracle") {
    var checked = 0
    (0L until N).foreach { id =>
      val want = oracle(id, arMissing = id % 13 == 0)
      val got = products.get(id)
      (want, got) match {
        case (None, None) => // NameError path: row correctly absent
        case (Some(w), Some(g)) =>
          assert(g.size == 34, s"id=$id width")
          w.zip(g).zipWithIndex.foreach { case ((we, ge), i) =>
            assert(we == ge, s"id=$id col=${graft.model.Product.sinkOrder(i)}")
          }
          checked += 1
        case _ => fail(s"id=$id presence mismatch: oracle=${want.isDefined} got=${got.isDefined}")
      }
    }
    assert(checked > 150, s"only $checked rows checked — corpus too degenerate")
  }

  test("branch coverage: sentinels, null ld fields, P17 swap, ar variants all occur") {
    val ids = 0L until N
    assert(ids.exists(!Synthetic.mHasLd(_)), "no NameError case")
    assert(ids.exists(id => Synthetic.mHasLd(id) && Synthetic.mLdCase(id, 31) == 0), "no missing-name case")
    assert(ids.exists(id => Synthetic.mHasLd(id) && Synthetic.mLdCase(id, 31) == 1), "no null-name case")
    assert(ids.exists(id => Synthetic.mHasLd(id) && !Synthetic.mHasPb(id) && Synthetic.mHasPa(id)), "no swap case")
    assert(ids.exists(id => Synthetic.mHasLd(id) && Synthetic.mArCase(id) == 2), "no lxml-None case")
    assert(ids.exists(id => Synthetic.mHasLd(id) && Synthetic.mArCase(id) == 3), "no ar-sentinel case")
  }

  test("xpath engine: positional steps, bare steps, miss cases") {
    val html = "<html><body><div>a</div><div>b</div><div><div><main><div><div><div>" +
      "<div>first</div><div><div><header><div><h5>Name X</h5></div></header></div></div>" +
      "</div></div></div></main></div></div></body></html>"
    val root = MiniHtml.parse(html)
    val hit = MiniHtml.selectXPath(root, ExtractKernel.MetroArNameXPath)
    assert(hit.map(_.text) == List("Name X"))
    assert(MiniHtml.selectXPath(root, "/html/body/div[2]").map(_.text) == List("b"))
    assert(MiniHtml.selectXPath(root, "/html/body/div").size == 3)
    assert(MiniHtml.selectXPath(root, "/html/body/div[9]").isEmpty)
    assert(MiniHtml.selectXPath(root, "/html/body/span").isEmpty)
    // lxml .text semantics: direct text only, None when first child is an elem
    val wrapped = MiniHtml.parse("<h5><span>x</span></h5>")
    val h5 = MiniHtml.selectXPath(wrapped, "/h5").head
    assert(MiniHtml.directText(h5).isEmpty)
    val mixed = MiniHtml.parse("<h5>lead<span>x</span>tail</h5>")
    assert(MiniHtml.directText(MiniHtml.selectXPath(mixed, "/h5").head).contains("lead"))
  }
}
