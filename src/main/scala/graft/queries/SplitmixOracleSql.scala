package graft.queries

import graft.gen.Synthetic

/** Closed-form DuckDB oracles for the two HTML-extraction queries.
  *
  * Every field the kernel extracts from a synthetic page is a pure function
  * of (Seed, id) through splitmix64 (gen/Synthetic.scala:27-87), so the
  * oracle can restate the ENTIRE 34-column product row in SQL by replaying
  * the mix — no HTML parsing in DuckDB, same playbook as q_url_canon_full's
  * messy-URL family, carried to full hash-exactness. The 64-bit wrapping
  * arithmetic splitmix64 needs is exact in DuckDB via UBIGINT columns with
  * UHUGEINT (unsigned 128-bit) intermediates for the two multiplies: a
  * 64x64 product is < 2^128, so `(a::UHUGEINT * m) % 2^64` is the wrapped
  * Scala `a * m` bit-for-bit. Java signed semantics map as:
  *   - `x & mask` (mask >= 0)     -> unsigned `&` unchanged;
  *   - `(x % m).abs` (m > 0)      -> |x| % m, where |x| for "negative"
  *     unsigned u (u >= 2^63) is 2^64 - u (exact in UBIGINT as
  *     (2^64-1 - u) + 1);
  *   - `numberOfTrailingZeros(x | 2^11)` -> an 11-arm bit CASE.
  *
  * Expression blow-up control: inlining mix() chains doubles the argument
  * expression per xor-shift stage (8 copies after three stages), so the mix
  * pipeline runs stage-at-a-time across CTE layers — all salts advance one
  * stage per layer and every stage output is a named column referenced at
  * most twice in the next layer. Two waves: wave 1 computes h = mix(id)
  * (and mix(mixSeed ^ id) for the host index); wave 2 computes
  * o_s = mix(h ^ s) for every salt s the fields need — mix2(id, s) =
  * mix(mix(id) ^ s) shares mix(id) across all salts, and mix2(Seed, id) =
  * mix(mix(Seed) ^ id) inlines mix(Seed) as a constant.
  *
  * Field semantics mirrored (kept in lockstep with the generator + kernel;
  * a drift on either side fails CORRECTNESS, which is the point):
  *   - Carrefour projection: extract/Extractors.scala:70-120 over
  *     ExtractKernel sentinels (extract/ExtractKernel.scala:44-56) and
  *     Synthetic.pageHtml branch controls (gen/Synthetic.scala:51-87);
  *   - Metro projection: extract/Extractors.scala:137-177 over
  *     Synthetic.metroPageHtml controls (gen/Synthetic.scala:183-199).
  */
object SplitmixOracleSql {

  private def us(x: Long): String = java.lang.Long.toUnsignedString(x)

  private val C = us(0x9E3779B97F4A7C15L)  // splitmix64 increment
  private val M1 = us(0xBF58476D1CE4E5B9L) // stage-1 multiplier
  private val M2 = us(0x94D049BB133111EBL) // stage-2 multiplier
  private val MixSeed = us(Synthetic.mix(Synthetic.Seed))
  private val H64 = "18446744073709551616::UHUGEINT" // 2^64

  private def addw(a: String, c: String): String =
    s"CAST((CAST($a AS UHUGEINT) + $c::UHUGEINT) % $H64 AS UBIGINT)"
  private def mulw(a: String, c: String): String =
    s"CAST((CAST($a AS UHUGEINT) * $c::UHUGEINT) % $H64 AS UBIGINT)"
  private def xs(col: String, k: Int): String = s"xor($col, $col >> $k)"
  private def band(col: String, m: Long): String = s"($col & ${m}::UBIGINT)"
  /** Java `(x % m).abs` over the unsigned column representation. */
  private def amod(col: String, m: Long): String =
    s"(CASE WHEN $col < 9223372036854775808::UBIGINT THEN $col % ${m}::UBIGINT " +
      s"ELSE ((18446744073709551615::UBIGINT - $col) + 1::UBIGINT) % ${m}::UBIGINT END)"
  private def s_(e: String): String = s"CAST($e AS VARCHAR)"

  /** One full mix() advanced stage-at-a-time: 4 CTE layers computing every
    * (name, argExpr) pair in parallel columns, `carry` passed through. */
  private def mixWave(src: String, outs: Seq[(String, String)], carry: Seq[String],
      prefix: String): (Seq[String], String) = {
    val cs = carry.mkString(", ")
    val l1 = s"${prefix}a AS (SELECT $cs, " +
      outs.map { case (n, a) => s"${addw(a, C)} AS $n" }.mkString(", ") + s" FROM $src)"
    val l2 = s"${prefix}b AS (SELECT $cs, " +
      outs.map { case (n, _) => s"${mulw(xs(n, 30), M1)} AS $n" }.mkString(", ") + s" FROM ${prefix}a)"
    val l3 = s"${prefix}c AS (SELECT $cs, " +
      outs.map { case (n, _) => s"${mulw(xs(n, 27), M2)} AS $n" }.mkString(", ") + s" FROM ${prefix}b)"
    val l4 = s"${prefix}d AS (SELECT $cs, " +
      outs.map { case (n, _) => s"${xs(n, 31)} AS $n" }.mkString(", ") + s" FROM ${prefix}c)"
    (Seq(l1, l2, l3, l4), s"${prefix}d")
  }

  /** CTE chain yielding one row per id in [0, nRows) with columns `id`,
    * `o<s>` = mix2(id, s) per salt, and (optionally) `ohost` = mix2(Seed, id). */
  private def saltsWave(nRows: Long, salts: Seq[Int], withHost: Boolean): (Seq[String], String) = {
    val ids = s"ids AS (SELECT CAST(range AS UBIGINT) AS id FROM range(0,$nRows))"
    val w1outs = ("h", "id") +: (if (withHost) Seq(("ohost", s"xor($MixSeed::UBIGINT, id)")) else Nil)
    val (w1, w1f) = mixWave("ids", w1outs, Seq("id"), "m")
    val w2outs = salts.map(s => (s"o$s", s"xor(h, ${s}::UBIGINT)"))
    val (w2, w2f) = mixWave(w1f, w2outs, "id" +: (if (withHost) Seq("ohost") else Nil), "s")
    (ids +: (w1 ++ w2), w2f)
  }

  private val CatWords = Seq("one", "two", "three", "four", "five", "six")
  // Arabic literals of the generator/kernel (Synthetic.nameAr/brandAr/catName,
  // ExtractKernel.NameSentinelAr), restated for the SQL text
  private val ArName = "منتج"
  private val ArLux = "فاخر"
  private val ArBrand = "ماركة"
  private val ArCat = "قسم"
  private val ArMetro = "مترو"
  private val ArNameSentinel = graft.extract.ExtractKernel.NameSentinelAr

  /** "cents -> d+.dd" shared by priceAfterVal/priceBeforeVal (Synthetic:73-81). */
  private def priceStr(c: String): String =
    s"(${s_(s"($c // 100::UBIGINT)")} || '.' || lpad(${s_(s"($c % 100::UBIGINT)")}, 2, '0'))"

  /** q_extract_products: the full 34-column Carrefour projection restated
    * closed-form for ids 0..199 (both language pages exist for every id, so
    * exactly one product row per id). */
  val carrefourExtractSql: String = {
    val salts = Seq(1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 17, 20,
      102, 103, 104, 105, 106, 107)
    val (ctes, src) = saltsWave(200, salts, withHost = true)
    val id = s_("id")
    val hasName = s"(${band("o1", 15)} <> 0)"
    val emptyNm = s"(${band("o20", 31)} = 0)"
    val hasBrand = s"(${band("o2", 7)} <> 0)"
    val k = amod("o3", 10)
    val bcase = amod("o4", 4)
    val hasOffer = s"(${band("o5", 3)} = 0)"
    val hasImage = s"(${band("o7", 7)} <> 0)"
    val dDays = s"(${amod("o8", 30)} + 1::UBIGINT)"
    val hasSpan = s"(${band("o9", 1)} = 0)"
    val brandN = s_(amod("o10", 40))
    val cents = s"(${amod("o11", 99000)} + 100::UBIGINT)"
    val multiBc = s"(${band("o12", 7)} = 0)"
    val upCents = s"($cents + ${amod("o13", 5000)} + 100::UBIGINT)"
    val pa = priceStr(cents)
    val pb = priceStr(upCents)
    val bcv = s"(CASE WHEN $multiBc THEN '62211' || ${s_(band("o14", 0xFFFFFL))} || " +
      s"', 72211' || ${s_(band("o15", 0xFFFFFL))} ELSE '62211' || ${s_(band("o14", 0xFFFFFL))} END)"
    val slugN = s_(band("o17", 0x3FFL))
    // hostIdx: trailing zeros of mix2(Seed,id) | 2^11 (Synthetic:37-40)
    val hostBits = "(ohost | 2048::UBIGINT)"
    val ctz = "(CASE " + (0 until 11).map(i =>
      s"WHEN ($hostBits & ${1L << i}::UBIGINT) <> 0 THEN $i").mkString(" ") + " ELSE 11 END)"
    // nav categories: kernel drops the 'Home' crumb, pads to 7; the Product
    // projection then indexes [1..6] of THAT list (the reference off-by-one)
    // -> category_i = catName(id, i+1) iff k >= i+2 (Extractors.scala:74-75).
    def catName(lang: String, j: Int): String = {
      val v = s_(amod(s"o${100 + j}", 20))
      if (lang == "en") s"('Aisle-' || $v)" else s"('$ArCat-' || $v)"
    }
    def catCol(lang: String, i: Int): String =
      s"CASE WHEN $k >= ${i + 2}::UBIGINT THEN ${catName(lang, i + 1)} ELSE '' END"
    val cols = Seq(
      "'Carrefour' AS merchant",
      s"$id AS product_id",
      s"CASE WHEN $hasBrand THEN '$ArBrand' || $brandN ELSE '' END AS brand_ar",
      s"CASE WHEN $hasBrand THEN 'Brand' || $brandN ELSE '' END AS brand_en",
      s"CASE WHEN $bcase = 0 THEN $bcv WHEN $bcase = 3 THEN 'Product barcode not found' " +
        s"ELSE 'E' || $id END AS barcode",
      s"CASE WHEN $hasName AND NOT $emptyNm THEN '$ArName ' || $id || ' $ArLux' " +
        s"ELSE '$ArNameSentinel' END AS name_ar",
      s"CASE WHEN $hasName AND NOT $emptyNm THEN 'Product ' || $id || ' Deluxe' " +
        s"ELSE 'Product name not found' END AS name_en") ++
      CatWords.zipWithIndex.map { case (w, i0) => s"${catCol("en", i0 + 1)} AS category_${w}_eng" } ++
      Seq("seven", "eight", "nine").map(w => s"'' AS category_${w}_eng") ++
      CatWords.zipWithIndex.map { case (w, i0) => s"${catCol("ar", i0 + 1)} AS category_${w}_ar" } ++
      Seq("seven", "eight", "nine").map(w => s"'' AS category_${w}_ar") ++ Seq(
      s"$pb AS price_before",
      s"CASE WHEN $hasOffer THEN $pa ELSE '' END AS price_after",
      s"CASE WHEN $hasOffer THEN '2024-11-10' ELSE '' END AS offer_start_date",
      s"CASE WHEN $hasOffer AND $hasSpan THEN " +
        s"strftime(DATE '2024-11-10' + CAST($dDays AS INTEGER), '%Y-%m-%d') ELSE '' END AS offer_end_date",
      s"'https://shop' || ${s_(ctz)} || '.example.com/mafegy/en/item-' || $slugN || '-' || $id || " +
        s"'/p/' || $id AS url",
      "'' AS brand_image_url",
      s"CASE WHEN $hasImage THEN 'https://img.example.com/p' || $id || '.jpg' " +
        s"ELSE 'Image not found' END AS image_url",
      "'Website' AS source_type",
      "'2024-11-10' AS crawled_on")
    "WITH " + ctes.mkString(",\n") + "\nSELECT " + cols.mkString(",\n  ") + s"\nFROM $src"
  }

  /** q_extract_metro: the Metro projection closed-form for ids 0..299 —
    * rows exist iff the ld+json island does (mHasLd, the NameError failure
    * path drops the rest); the Arabic page is absent for id % 13 = 0. */
  val metroExtractSql: String = {
    val salts = Seq(11, 13, 30, 31, 32, 33, 34, 35, 36, 37, 38, 39, 102, 103, 104, 105)
    val (ctes, src) = saltsWave(300, salts, withHost = false)
    val id = s_("id")
    val hasLd = s"(${band("o30", 7)} <> 0)"
    def ldc(salt: Int): String = band(s"o$salt", 15)
    val arCase = amod("o36", 4)
    val nc = amod("o37", 7)
    val hasPb = s"(${band("o34", 1)} = 0)"
    val hasPa = s"(${band("o35", 3)} <> 0)"
    val mbrand = s_(amod("o38", 25))
    val cents = s"(${amod("o11", 99000)} + 100::UBIGINT)"
    val upCents = s"($cents + ${amod("o13", 5000)} + 100::UBIGINT)"
    val pbRaw = s"(CASE WHEN $hasPb THEN ${priceStr(upCents)} ELSE '' END)"
    val paRaw = s"(CASE WHEN $hasPa THEN ${priceStr(cents)} ELSE '' END)"
    val swapped = s"(NOT $hasPb)" // P17: pbRaw = '' iff the before-price is absent
    // ld+json `.get(k, default)` semantics: key missing -> sentinel, null -> ''
    def ldField(salt: Int, sentinel: String, present: String): String =
      s"CASE WHEN ${ldc(salt)} = 0 THEN '$sentinel' WHEN ${ldc(salt)} = 1 THEN '' ELSE $present END"
    val arMissing = "(id % 13::UBIGINT = 0)"
    def catName(lang: String, j: Int): String = {
      val v = s_(amod(s"o${100 + j}", 20))
      if (lang == "en") s"('Aisle-' || $v)" else s"('$ArCat-' || $v)"
    }
    // breadcrumbs: ['Home', c1..c(nc-1), ''(the a-less li)] -> drop first,
    // pad 7; crumb(i) = catName(id, i+1) iff nc >= i+2; nc <= 6 so i >= 5 is ''.
    def crumbCol(lang: String, i: Int): String =
      if (i + 2 > 6) "''"
      else {
        val inner = s"CASE WHEN $nc >= ${i + 2}::UBIGINT THEN ${catName(lang, i + 1)} ELSE '' END"
        if (lang == "ar") s"CASE WHEN $arMissing THEN '' ELSE $inner END" else inner
      }
    // arNameXpath: case 2 = h5 wraps a child element (lxml .text None -> ''),
    // case 3 = no h5 at the path -> Arabic sentinel; ar page missing -> sentinel.
    val nameAr = s"CASE WHEN $arMissing THEN '$ArNameSentinel' WHEN $arCase = 2 THEN '' " +
      s"WHEN $arCase = 3 THEN '$ArNameSentinel' ELSE '$ArName $ArMetro ' || $id END"
    val cols = Seq(
      "'MetroMarkets' AS merchant",
      s"${ldField(33, "Product ID not found", s"'mp-' || $id")} AS product_id",
      "'' AS brand_ar",
      s"${ldField(32, "Brand name not found", s"'MBrand' || $mbrand")} AS brand_en",
      "'' AS barcode",
      s"$nameAr AS name_ar",
      s"${ldField(31, "Product name not found", s"'Metro Product ' || $id")} AS name_en") ++
      CatWords.zipWithIndex.map { case (w, i0) => s"${crumbCol("en", i0 + 1)} AS category_${w}_eng" } ++
      Seq("seven", "eight", "nine").map(w => s"'' AS category_${w}_eng") ++
      CatWords.zipWithIndex.map { case (w, i0) => s"${crumbCol("ar", i0 + 1)} AS category_${w}_ar" } ++
      Seq("seven", "eight", "nine").map(w => s"'' AS category_${w}_ar") ++ Seq(
      s"CASE WHEN $swapped THEN $paRaw ELSE $pbRaw END AS price_before",
      s"CASE WHEN $swapped THEN '' ELSE $paRaw END AS price_after",
      s"CASE WHEN $swapped THEN '' ELSE '2024-11-10' END AS offer_start_date",
      "'' AS offer_end_date",
      s"'https://metro.example.com/product/metro-item-' || $id AS url",
      "'' AS brand_image_url",
      s"${ldField(39, "Image URL not found", s"'https://img.example.com/m' || $id || '.jpg'")} AS image_url",
      "'Website' AS source_type",
      "'2024-11-10' AS crawled_on")
    "WITH " + ctes.mkString(",\n") + "\nSELECT " + cols.mkString(",\n  ") +
      s"\nFROM $src\nWHERE $hasLd"
  }
}
