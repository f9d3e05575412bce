package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.app.{CrawlEngine, MerchantSpec}
import graft.sources.FrontierSources

/** Oscar end-to-end (oscar_extract_product_urls.py): the reference's output
  * IS a frontier — category pages are fetched, hrefs containing
  * `show_product` are kept (:31), relative ones resolved against the store
  * base (:33-36), and the resulting product URLs become the next crawl
  * generation. Seeds arrive via the category_urls.json variant
  * (S2, oscar_extract_category_urls.py output shape). */
class CrawlEngineOscarSpec extends SparkTestBase {

  private val Base = "https://www.oscarstores.com"

  private def categoryPage(cat: Int): String = {
    val sb = new StringBuilder("<html><body>")
    sb.append(s"""<a href="/show_product/p$cat-rel">rel</a>""")
    sb.append(s"""<a href="$Base/show_product/p$cat-abs">abs</a>""")
    sb.append(s"""<a href="$Base/category/other$cat">not-a-product</a>""")
    sb.append("<a>nohref</a>")
    sb.append("</body></html>")
    sb.toString
  }

  test("seed JSON -> engine drain: show_product harvest absolutized, zero product rows") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-oscar").toString
    // S2: the Oscar seed file shape ({"categories":[{"category","url"}]})
    val seedPath = s"$dir/category_urls.json"
    val json = (0 until 3).map(i =>
      s"""{"category": "oscar-cat$i", "url": "$Base/category/c$i"}""").mkString(
      """{"categories": [""", ",", "]}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(seedPath), json)
    val seeds = FrontierSources.readSeedJson(spark, seedPath)
      .withColumn("is_processed", lit(false))
      .withColumn("discovered_seq", col("rank").cast("long"))
      .select("category", "url", "is_processed", "discovered_seq")

    val e = new CrawlEngine(spark, dir, numPartitions = 4,
      defaultBudget = 1000, maxAttempts = 1, merchant = MerchantSpec.oscar)
    e.init(e.enrichSeeds(seeds))
    val pages = (0 until 3).flatMap { i =>
      Seq("en", "ar").map(lang => graft.model.Page(s"$Base/category/c$i",
        new java.sql.Timestamp(1700000000000L + i),
        categoryPage(i).getBytes("UTF-8"), "", lang))
    }.toDF()
    val robots = Seq.empty[(String, String, Boolean, Int)]
      .toDF("host", "path_prefix", "allow", "crawl_delay_ms")
    val budgets = Seq.empty[(String, Int)].toDF("host", "per_round")
    e.run(pages, robots, budgets)

    // round 1 = the 3 category pages; round 2 = exactly the absolutized
    // show_product urls (relative + absolute), nothing else
    val sched = e.scheduleTable.read().get.select("round", "url_norm").collect()
      .map(r => (r.getInt(0), r.getString(1)))
    assert(sched.filter(_._1 == 1).map(_._2).toSet ==
      (0 until 3).map(i => s"$Base/category/c$i".toLowerCase).toSet)
    val want2 = (0 until 3).flatMap(i => Seq(
      s"$Base/show_product/p$i-rel", s"$Base/show_product/p$i-abs")).toSet
    assert(sched.filter(_._1 == 2).map(_._2).toSet == want2)
    // Oscar extracts URLs, not products (no extract script in the reference)
    assert(e.productsTable.read().forall(_.isEmpty))
    // product urls have no pages -> quarantined at maxAttempts=1
    val quarantined = e.quarantineTable.read().get
      .select("url_norm").collect().map(_.getString(0)).toSet
    assert(quarantined == want2)
  }
}
