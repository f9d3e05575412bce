package graft.oracle

import graft.extract.ExtractKernel
import graft.gen.Synthetic

/** Straight-line Metro reference oracle, shared by MetroExtractSpec (the
  * projection byte-identity suite) and CrawlEngineMetroSpec (the full
  * engine drain). */
object MetroOracle {

  /** Straight-line reference oracle for one id; None = the NameError failure
    * path (no ld+json island, metro:116-134). arMissing mirrors a failed
    * Arabic fetch (error page -> xpath finds nothing -> sentinel). */
  def product(id: Long, arMissing: Boolean, RunDate: String): Option[Seq[String]] = {
    if (!Synthetic.mHasLd(id)) return None
    def ld(salt: Long, v: String, sentinel: String): String =
      Synthetic.mLdCase(id, salt) match {
        case 0 => sentinel
        case 1 => ""
        case _ => v
      }
    val nameEn = ld(31, Synthetic.mNameEn(id), "Product name not found")
    val brandEn = ld(32, Synthetic.mBrand(id), "Brand name not found")
    val productId = ld(33, s"mp-$id", "Product ID not found")
    val image = ld(39, s"https://img.example.com/m$id.jpg", "Image URL not found")
    val nameAr =
      if (arMissing) ExtractKernel.NameSentinelAr
      else Synthetic.mArCase(id) match {
        case 2 => "" // lxml .text None -> empty cell
        case 3 => ExtractKernel.NameSentinelAr
        case _ => Synthetic.mNameAr(id)
      }
    def crumbs(lang: String): Seq[String] = {
      val cs = (1 until math.max(Synthetic.mNCrumbs(id), 1))
        .map(i => Synthetic.catName(id, i, lang))
      ((cs :+ "") ++ Seq.fill(7)("")).take(7) // drop "Home", "plain" li -> ""
    }
    def cat(lang: String, i: Int): String =
      if (lang == "ar" && arMissing) "" else crumbs(lang)(i)
    val pbRaw = if (Synthetic.mHasPb(id)) Synthetic.priceBeforeVal(id) else ""
    val paRaw = if (Synthetic.mHasPa(id)) Synthetic.priceAfterVal(id) else ""
    val offerStart = if (pbRaw.nonEmpty) RunDate else ""
    val (pb, pa) = if (pbRaw.isEmpty) (paRaw, "") else (pbRaw, paRaw)
    Some(Seq(
      "MetroMarkets", productId, "", brandEn, "", nameAr, nameEn,
      cat("en", 1), cat("en", 2), cat("en", 3), cat("en", 4), cat("en", 5), cat("en", 6),
      "", "", "",
      cat("ar", 1), cat("ar", 2), cat("ar", 3), cat("ar", 4), cat("ar", 5), cat("ar", 6),
      "", "", "",
      pb, pa, offerStart, "",
      Synthetic.mUrl(id, "en"), "", image, "Website", RunDate))
  }

}
