package graft.gen

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.model.{FrontierEntry, HostBudget, Page, RobotsRule}

/** Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1-2,6).
  *
  * All variation derives from splitmix64 mixes of (seed, id) — no wall clock,
  * no Random — so any scale factor regenerates byte-identically on every
  * executor, and the test oracle can compute every expected value from the
  * same pure functions without parsing anything.
  *
  * The HTML embeds the reference's extraction targets (CSS classes, the
  * `#__NEXT_DATA__` island, ld+json, breadcrumbs, link lists — citations in
  * ExtractKernel) with controlled presence/absence so every sentinel branch
  * of SURVEY.md §2.2 is exercised. Hosts follow a geometric (Zipf-like) skew:
  * host k receives ~2^-(k+1) of the URLs, so host 0 dominates — the skew the
  * salted repartition must defeat.
  */
object Synthetic extends Serializable {

  final val Seed = 0x9E3779B97F4A7C15L
  final val NumHosts = 12

  /** splitmix64 finalizer — deterministic pseudo-hash. */
  def mix(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  def mix2(a: Long, b: Long): Long = mix(mix(a) ^ b)

  // ---------------- per-id derivations (shared by generator & oracle) ------

  def hostIdx(id: Long): Int = {
    val z = java.lang.Long.numberOfTrailingZeros(mix2(Seed, id) | (1L << (NumHosts - 1)))
    math.min(z, NumHosts - 1)
  }
  def host(id: Long): String = s"shop${hostIdx(id)}.example.com"

  def slug(id: Long): String = s"item-${(mix2(id, 17) & 0x3FF).toInt}-$id"

  /** Carrefour-shaped product URL (extract_carrefour_urls_19_09_2024.csv:2-5). */
  def url(id: Long, lang: String): String =
    s"https://${host(id)}/mafegy/$lang/${slug(id)}/p/$id"

  def category(id: Long): String = s"cat${(mix2(id, 23) % 8).abs.toInt}"

  def hasName(id: Long): Boolean = (mix2(id, 1) & 15) != 0       // ~94%
  /** Element present but empty text — the falsy-string sentinel branch of
    * extraction_helpers.py:6 (`name if name else sentinel`). */
  def emptyName(id: Long): Boolean = hasName(id) && (mix2(id, 20) & 31) == 0
  def hasBrand(id: Long): Boolean = (mix2(id, 2) & 7) != 0       // ~88%
  def nCats(id: Long): Int = ((mix2(id, 3) % 10).abs).toInt      // 0..9
  /** 0 = barCodes[], 1 = ean only, 2 = empty barCodes + ean, 3 = none */
  def barcodeCase(id: Long): Int = ((mix2(id, 4) % 4).abs).toInt
  def hasOffer(id: Long): Boolean = (mix2(id, 5) & 3) == 0       // 25%
  def useCodePoison(id: Long): Boolean = (mix2(id, 6) & 7) == 0  // 12.5%
  def hasImage(id: Long): Boolean = (mix2(id, 7) & 7) != 0
  def offerDays(id: Long): Int = ((mix2(id, 8) % 30).abs + 1).toInt
  def hasOfferSpan(id: Long): Boolean = (mix2(id, 9) & 1) == 0
  def multiBarcode(id: Long): Boolean = (mix2(id, 12) & 7) == 0  // 12.5%

  def nameEn(id: Long): String = s"Product $id Deluxe"
  def nameAr(id: Long): String = s"منتج $id فاخر"
  def brandEn(id: Long): String = s"Brand${(mix2(id, 10) % 40).abs}"
  def brandAr(id: Long): String = s"ماركة${(mix2(id, 10) % 40).abs}"
  def catName(id: Long, i: Int, lang: String): String =
    if (lang == "ar") s"قسم-${(mix2(id, 100 + i) % 20).abs}" else s"Aisle-${(mix2(id, 100 + i) % 20).abs}"

  def priceAfterVal(id: Long): String = {
    val cents = (mix2(id, 11) % 99000).abs + 100
    s"${cents / 100}.${"%02d".format(cents % 100)}"
  }
  def priceBeforeVal(id: Long): String = {
    val cents = (mix2(id, 11) % 99000).abs + 100
    val up = cents + ((mix2(id, 13) % 5000).abs + 100)
    s"${up / 100}.${"%02d".format(up % 100)}"
  }
  def barcodeVal(id: Long): String =
    if (multiBarcode(id)) s"62211${(mix2(id, 14) & 0xFFFFF)}, 72211${(mix2(id, 15) & 0xFFFFF)}"
    else s"62211${(mix2(id, 14) & 0xFFFFF)}"

  def warcTs(id: Long): Timestamp =
    new Timestamp(1700000000000L + (mix2(id, 16) % 86400000L).abs)

  // ---------------- HTML assembly ------------------------------------------

  /** The synthetic product page for (id, lang). */
  def pageHtml(id: Long, lang: String): String = {
    val sb = new StringBuilder(2048)
    val en = lang == "en"
    sb.append("<!DOCTYPE html><html><head><title>p").append(id).append("</title>")
    // ld+json island (P15)
    sb.append("""<script type="application/ld+json">{"name":""")
      .append("\"LD ").append(nameEn(id)).append("\",\"brand\":{\"name\":\"")
      .append(brandEn(id)).append("\"},\"productID\":\"ld-").append(id)
      .append("\",\"image\":\"https://img.example.com/ld-").append(id).append(".jpg\"}</script>")
    // __NEXT_DATA__ island (P7)
    barcodeCase(id) match {
      case 0 =>
        sb.append("""<script id="__NEXT_DATA__" type="application/json">""")
          .append(s"""{"props":{"initialProps":{"pageProps":{"initialData":{"products":[{"attributes":{"barCodes":["${barcodeVal(id)}"],"ean":"E${id}"}}]}}}}}""")
          .append("</script>")
      case 1 =>
        sb.append("""<script id="__NEXT_DATA__" type="application/json">""")
          .append(s"""{"props":{"initialProps":{"pageProps":{"initialData":{"products":[{"attributes":{"ean":"E${id}"}}]}}}}}""")
          .append("</script>")
      case 2 =>
        sb.append("""<script id="__NEXT_DATA__" type="application/json">""")
          .append(s"""{"props":{"initialProps":{"pageProps":{"initialData":{"products":[{"attributes":{"barCodes":[],"ean":"E${id}"}}]}}}}}""")
          .append("</script>")
      case _ => // no island at all -> sentinel
    }
    sb.append("</head><body>")
    // name (P1/P2); emptyName exercises the found-but-empty sentinel branch
    if (hasName(id))
      sb.append("""<h1 class="css-106scfp">""")
        .append(if (emptyName(id)) "" else if (en) nameEn(id) else nameAr(id))
        .append("</h1>")
    // brand (P4)
    if (hasBrand(id))
      sb.append("""<div class="css-1nnke3o"> """).append(if (en) brandEn(id) else brandAr(id)).append(" </div>")
    // categories (P6): first element is the site-root crumb the reference drops
    val k = nCats(id)
    if (k > 0) {
      sb.append("""<nav><span class="css-iamwo8">Home</span>""")
      (1 until k).foreach { i =>
        sb.append("""<span class="css-iamwo8"> """).append(catName(id, i, lang)).append(" </span>")
      }
      sb.append("</nav>")
    }
    // breadcrumb trail (Metro variant) incl. an li without <a>
    sb.append("""<ul class="breadcrumb"><li><a>Home</a></li>""")
    (1 until math.min(k, 5)).foreach { i =>
      sb.append("<li><a> ").append(catName(id, i, lang)).append(" </a></li>")
    }
    sb.append("<li>no-link</li></ul>")
    // prices (P9/P10/P16)
    if (hasOffer(id)) {
      sb.append("""<span class="css-1i90gmp">EGP """).append(priceAfterVal(id)).append("</span>")
      if (useCodePoison(id))
        sb.append("""<del class="css-1bdwabt">Use code SAVE10</del>""")
          .append("""<div class="css-17ctnp">EGP """).append(priceBeforeVal(id)).append("</div>")
      else
        sb.append("""<del class="css-1bdwabt">EGP """).append(priceBeforeVal(id)).append("</del>")
    } else {
      sb.append("""<div class="css-17ctnp">EGP """).append(priceBeforeVal(id)).append("</div>")
    }
    sb.append("""<div class="price"><p class="before">LE """).append(priceBeforeVal(id))
      .append("""</p><p class="after">LE """).append(priceAfterVal(id)).append("</p></div>")
    // offer countdown (P5)
    if (hasOffer(id) && hasOfferSpan(id))
      sb.append("""<div class="css-juexlj"><span>Offer ends in</span><span>""")
        .append(offerDays(id)).append(" days</span></div>")
    // image (P8)
    if (hasImage(id))
      sb.append("""<div class="css-1c2pck7"><img src="https://img.example.com/p""")
        .append(id).append(""".jpg" alt="p"/></div>""")
    // link harvest targets (P14): absolute, relative, missing-href
    sb.append("""<a href="https://""").append(host(id)).append("/mafegy/en/")
      .append(slug(mix2(id, 18).abs % math.max(id + 1, 1))).append("/p/")
      .append(mix2(id, 18).abs % math.max(id + 1, 1)).append("\">rel</a>")
    sb.append("""<a href="/mafegy/en/c/clp_deals""").append(id % 50).append("\">cat</a>")
    sb.append("<a>nohref</a>")
    sb.append("</body></html>")
    sb.toString
  }

  /** The golden "extracted text per url" — the name field, exactly what the
    * reference's extractor yields for this page (sentinels included; an
    * empty extracted name is falsy in Python and also yields the sentinel). */
  def expectedText(id: Long, lang: String): String =
    if (hasName(id) && !emptyName(id)) { if (lang == "en") nameEn(id) else nameAr(id) }
    else if (lang == "en") "Product name not found" else "لم يتم العثور على اسم المنتج"

  // ---------------- Metro corpus (metro_markets_extract_product_data.py) ----

  /** Field cases for the ld+json island: 0 = key missing (-> reference
    * sentinel), 1 = key null (-> ''), else present. */
  def mLdCase(id: Long, salt: Long): Int = {
    val m = (mix2(id, salt) & 15).toInt
    if (m == 0) 0 else if (m == 1) 1 else 2
  }
  def mHasLd(id: Long): Boolean = (mix2(id, 30) & 7) != 0   // ~88%; absent = NameError/failure path
  def mHasPb(id: Long): Boolean = (mix2(id, 34) & 1) == 0   // 50% -> exercises the P17 swap
  def mHasPa(id: Long): Boolean = (mix2(id, 35) & 3) != 0   // 75%
  /** AR xpath name: 0/1 = present, 2 = h5 wraps a child elem (lxml .text None),
    * 3 = h5 absent (sentinel). */
  def mArCase(id: Long): Int = (mix2(id, 36) % 4).abs.toInt
  def mNCrumbs(id: Long): Int = (mix2(id, 37) % 7).abs.toInt
  def mNameEn(id: Long): String = s"Metro Product $id"
  def mNameAr(id: Long): String = s"منتج مترو $id"
  def mBrand(id: Long): String = s"MBrand${(mix2(id, 38) % 25).abs}"
  def mUrl(id: Long, lang: String): String =
    if (lang == "ar") s"https://metro.example.com/ar/product/metro-item-$id"
    else s"https://metro.example.com/product/metro-item-$id"

  /** Synthetic Metro page: ld+json island (en semantics), the exact lxml
    * xpath path to the Arabic h5, breadcrumbs, and the .price before/after
    * pair, each branch-controlled. */
  def metroPageHtml(id: Long, lang: String): String = {
    val sb = new StringBuilder(2048)
    sb.append("<!DOCTYPE html><html><head><title>m").append(id).append("</title>")
    if (mHasLd(id)) {
      def fld(k: String, salt: Long, v: String): String = mLdCase(id, salt) match {
        case 0 => "" // key missing
        case 1 => s""""$k":null,"""
        case _ => s""""$k":"$v","""
      }
      sb.append("""<script type="application/ld+json">{""")
        .append(fld("name", 31, mNameEn(id)))
        .append(fld("brand", 32, mBrand(id)))
        .append(fld("productID", 33, s"mp-$id"))
        .append(fld("image", 39, s"https://img.example.com/m$id.jpg"))
        .append(""""@type":"Product"}</script>""")
    }
    sb.append("</head><body>")
    // two decoy divs so the target is body's div[3]
    sb.append("<div>decoy</div><div>decoy</div>")
    // the exact path /html/body/div[3]/div[1]/main/div/div/div/div[2]/div/header/div/h5
    sb.append("<div><div><main><div><div><div><div>first</div><div><div><header><div>")
    mArCase(id) match {
      case 2 => sb.append("<h5><span>wrapped</span></h5>")
      case 3 => // no h5 at the path -> sentinel
      case _ => sb.append("<h5>").append(if (lang == "ar") mNameAr(id) else mNameEn(id)).append("</h5>")
    }
    sb.append("</div></header></div></div></div></div></div></main></div></div>")
    // breadcrumb trail (first crumb dropped by the reference)
    sb.append("""<ul class="breadcrumb"><li><a>Home</a></li>""")
    (1 until math.max(mNCrumbs(id), 1)).foreach { i =>
      sb.append("<li><a>").append(catName(id, i, lang)).append("</a></li>")
    }
    sb.append("<li>plain</li></ul>")
    // metro price block (P16)
    sb.append("""<div class="price">""")
    if (mHasPb(id)) sb.append("""<p class="before">LE """).append(priceBeforeVal(id)).append("</p>")
    if (mHasPa(id)) sb.append("""<p class="after">LE """).append(priceAfterVal(id)).append("</p>")
    sb.append("</div>")
    sb.append("</body></html>")
    sb.toString
  }

  /** Golden extracted text for a Metro page: en = the ld+json name exactly as
    * `.get('name', sentinel)` yields it (null -> ''); ar = the xpath name. */
  def metroExpectedText(id: Long, lang: String): String =
    if (lang == "ar") mArCase(id) match {
      case 2 => "" // lxml .text None -> empty cell
      case 3 => "لم يتم العثور على اسم المنتج"
      case _ => mNameAr(id)
    } else mLdCase(id, 31) match {
      case 0 => "Product name not found"
      case 1 => ""
      case _ => mNameEn(id)
    }

  /** 2n Metro page rows (en + ar per id). */
  def metroPages(spark: SparkSession, n: Long, numPartitions: Int = 32): Dataset[Page] = {
    import spark.implicits._
    spark.range(0, n, 1, numPartitions).flatMap { id =>
      Seq("en", "ar").map { lang =>
        Page(mUrl(id, lang), warcTs(id), metroPageHtml(id, lang).getBytes("UTF-8"),
          metroExpectedText(id, lang), lang)
      }
    }
  }

  // ---------------- Spark generators ---------------------------------------

  /** 2n page rows (en + ar per id), distributed, deterministic. */
  def pages(spark: SparkSession, n: Long, numPartitions: Int = 32): Dataset[Page] = {
    import spark.implicits._
    spark.range(0, n, 1, numPartitions).flatMap { id =>
      Seq("en", "ar").map { lang =>
        Page(url(id, lang), warcTs(id), pageHtml(id, lang).getBytes("UTF-8"),
          expectedText(id, lang), lang)
      }
    }
  }

  /** Frontier over the EN urls; ~1/8 pre-processed; discovered_seq = id
    * (the reference CSV row order). Duplicate urls are injected every 11th
    * row to exercise the dedup gate. */
  def frontier(spark: SparkSession, n: Long, numPartitions: Int = 32): Dataset[FrontierEntry] = {
    import spark.implicits._
    import graft.url.UrlCanon
    spark.range(0, n, 1, numPartitions).flatMap { seqBoxed =>
      val seq: Long = seqBoxed
      val id: Long = if (seq % 11 == 10) seq - 1 else seq // duplicate of previous
      val raw = url(id, "en")
      val norm = UrlCanon.canonicalize(raw)
      val processed = (mix2(id, 19) & 7) == 0 && seq % 11 != 10
      Some(FrontierEntry(
        category = category(id),
        url = raw,
        is_processed = processed,
        url_norm = norm,
        url_hash = graft.util.Hashing.xxhash64(norm),
        host = UrlCanon.hostOf(norm),
        depth = UrlCanon.depthOf(norm),
        host_rank = hostIdx(id),
        discovered_seq = seq,
        attempt = 0))
    }
  }

  /** Politeness fixtures: per-host budgets + robots rules. Host shop1 denies
    * the /mafegy/ar prefix; all hosts allow the rest; crawl delay scales with
    * host rank. */
  def budgets(spark: SparkSession, perRound: Int = 100): Dataset[HostBudget] = {
    import spark.implicits._
    (0 until NumHosts).map(i => HostBudget(s"shop$i.example.com", perRound)).toDS()
  }

  def robots(spark: SparkSession): Dataset[RobotsRule] = {
    import spark.implicits._
    val rules = (0 until NumHosts).flatMap { i =>
      val h = s"shop$i.example.com"
      val deny = if (i == 1) Seq(RobotsRule(h, "/mafegy/ar", allow = false, 1000)) else Nil
      deny :+ RobotsRule(h, "/", allow = true, 100 * (i + 1))
    }
    rules.toDS()
  }
}
