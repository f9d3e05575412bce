package graft.extract

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Product

/** Spark plan layer over ExtractKernel: the EN⋈AR pivot (J1) + the 34-column
  * Product projection (SURVEY.md §2.2, §3.1). One `extract_all` UDF call per
  * (url, lang) page row — the page is parsed exactly once; everything else is
  * codegen'd column algebra so Catalyst can prune/push as usual.
  */
object Extractors {

  /** Struct-returning kernel UDF: (html string, lang) -> PageFields. Kept
    * for SQL registration; the hot path uses the native ExtractAllExpr
    * (same kernel, same struct, inside whole-stage codegen). */
  val extractAllUdf = udf((html: String, lang: String) => ExtractKernel.extractAll(html, lang))

  def register(spark: SparkSession): Unit =
    spark.udf.register("extract_all", extractAllUdf)

  /** P11 — product id from URL (carrefour_extract_data.py:146). */
  def productIdFromUrl(url: Column): Column = {
    val id = regexp_extract(url, "/p/(\\d+)", 1)
    when(id === "", lit("id not found")).otherwise(id)
  }

  /** Run the kernel over the page body — via the native expression, so the
    * 100 TB extract stage has no ScalaUDF node (VERDICT r03 #4). A BINARY
    * `html` column (the stored type, input_hint schema) feeds the
    * expression's bytes entry point directly — one UTF-8 decode straight
    * from the column bytes; routing through a `decode` column op cost two
    * extra full-body copies per page (VERDICT r04 "what's wrong" #4).
    * Pre-decoded string columns still work (SQL surface, tests). */
  def withPageFields(pages: DataFrame): DataFrame = {
    val htmlCol =
      if (pages.schema("html").dataType == org.apache.spark.sql.types.BinaryType) col("html")
      else col("html").cast("string")
    pages.withColumn("fields",
      graft.plans.ExtractAllExpr.extractAll(htmlCol, col("lang")))
  }

  /** J1 — EN⋈AR merge: two language rows of the same canonical URL become one
    * row with `en` and `ar` field structs. Left-outer on EN so a missing
    * Arabic page leaves AR fields at their sentinels, mirroring the
    * reference's failure path (seoudi_extract_data.py:333-346).
    *
    * Implemented as a groupBy + conditional-first aggregation rather than a
    * self-join: one shuffle on url_norm instead of two scans + a join, and it
    * keeps working when either language row is absent.
    */
  def pivotLangs(pagesWithFields: DataFrame, urlKey: String = "url_norm"): DataFrame = {
    val firstEn = first(when(col("lang") === "en", col("fields")), ignoreNulls = true)
    val firstAr = first(when(col("lang") === "ar", col("fields")), ignoreNulls = true)
    val firstUrlEn = first(when(col("lang") === "en", col("url")), ignoreNulls = true)
    pagesWithFields
      .groupBy(col(urlKey))
      .agg(firstEn.as("en"), firstAr.as("ar"), firstUrlEn.as("url_en"))
  }

  /** The Carrefour product projection — carrefour_extract_data.py:123-190.
    * `runDate` is the injected deterministic "now" (P5/P23 determinism,
    * SURVEY.md §7 hard-part 4), format yyyy-MM-dd.
    *
    * Note the reference's category off-by-one: extract_categories already
    * drops the first crumb and pads to 7, and the Product constructor then
    * indexes [1..6] of THAT list and hard-codes categories 7-9 to ''
    * (carrefour_extract_data.py:163-180). We reproduce it exactly.
    */
  def carrefourProduct(pivoted: DataFrame, runDate: String,
      passThrough: Seq[String] = Nil): DataFrame = {
    val en = col("en")
    val ar = col("ar")
    def cat(side: Column, i: Int): Column =
      coalesce(element_at(side.getField("categories"), i + 1), lit(""))
    def s(c: Column): Column = coalesce(c, lit(""))
    val priceAfter = s(en.getField("priceAfter"))
    val offerDays = en.getField("offerDaysToAdd")
    val cols: Seq[Column] = Seq(
      lit("Carrefour").as("merchant"),
      productIdFromUrl(s(col("url_en"))).as("product_id"),
      s(ar.getField("brand")).as("brand_ar"),
      s(en.getField("brand")).as("brand_en"),
      coalesce(en.getField("barcode"), lit(ExtractKernel.BarcodeSentinel)).as("barcode"),
      coalesce(ar.getField("name"), lit(ExtractKernel.NameSentinelAr)).as("name_ar"),
      coalesce(en.getField("name"), lit(ExtractKernel.NameSentinelEn)).as("name_en"),
      cat(en, 1).as("category_one_eng"),
      cat(en, 2).as("category_two_eng"),
      cat(en, 3).as("category_three_eng"),
      cat(en, 4).as("category_four_eng"),
      cat(en, 5).as("category_five_eng"),
      cat(en, 6).as("category_six_eng"),
      lit("").as("category_seven_eng"),
      lit("").as("category_eight_eng"),
      lit("").as("category_nine_eng"),
      cat(ar, 1).as("category_one_ar"),
      cat(ar, 2).as("category_two_ar"),
      cat(ar, 3).as("category_three_ar"),
      cat(ar, 4).as("category_four_ar"),
      cat(ar, 5).as("category_five_ar"),
      cat(ar, 6).as("category_six_ar"),
      lit("").as("category_seven_ar"),
      lit("").as("category_eight_ar"),
      lit("").as("category_nine_ar"),
      coalesce(en.getField("priceBefore"), lit(ExtractKernel.PriceSentinel)).as("price_before"),
      priceAfter.as("price_after"),
      // offer_start_date = runDate iff price_after non-empty (carrefour:151)
      when(priceAfter =!= "", lit(runDate)).otherwise(lit("")).as("offer_start_date"),
      // offer_end_date = runDate + days (carrefour:35-46); "" when absent
      when(offerDays >= 0,
        date_format(date_add(to_date(lit(runDate)), offerDays), "yyyy-MM-dd"))
        .otherwise(lit("")).as("offer_end_date"),
      s(col("url_en")).as("url"),
      lit("").as("brand_image_url"),
      coalesce(en.getField("imageUrl"), lit(ExtractKernel.ImageSentinel)).as("image_url"),
      lit("Website").as("source_type"),
      lit(runDate).as("crawled_on"))
    pivoted.select(cols ++ passThrough.map(col): _*)
      .select((Product.sinkOrder ++ passThrough).map(col): _*)
  }

  /** The Metro product projection — metro_markets_extract_product_data.py:
    * 90-169. Differences from Carrefour, reproduced exactly:
    *  - name_en/brand_en/product_id/image_url come from the ld+json island
    *    with the reference's `.get(k, default)` sentinels (metro:119-122);
    *    a page WITHOUT the island is the reference's NameError failure path
    *    (the URL fails and retries) -> those rows are dropped here [P15];
    *  - name_ar is the lxml-xpath extraction (metro:100-102) [P3];
    *  - categories come from the breadcrumb trail, same [1..6] off-by-one;
    *  - P17 price-swap (metro:129-131): when price_before is absent it takes
    *    price_after's value and price_after empties;
    *  - offer_start_date = runDate iff the PRE-swap price_before was present
    *    (metro:126 — note: keyed on price_BEFORE, where Carrefour keys on
    *    price_after, carrefour:151);
    *  - barcode/brand_ar/offer_end_date are hard-coded '' (metro:137-139,163).
    */
  def metroProduct(pivoted: DataFrame, runDate: String,
      passThrough: Seq[String] = Nil): DataFrame = {
    val en = col("en")
    val ar = col("ar")
    def crumb(side: Column, i: Int): Column =
      coalesce(try_element_at(side.getField("breadcrumbs"), lit(i + 1)), lit(""))
    val pbRaw = coalesce(en.getField("metroPriceBefore"), lit(""))
    val paRaw = coalesce(en.getField("metroPriceAfter"), lit(""))
    val swapped = pbRaw === "" // P17: before missing -> before<-after, after<-None
    val nameAr = when(ar.isNull, lit(ExtractKernel.NameSentinelAr))
      .otherwise(coalesce(ar.getField("arNameXpath"), lit("")))
    val cols: Seq[Column] = Seq(
      lit("MetroMarkets").as("merchant"),
      en.getField("ldProductId").as("product_id"),
      lit("").as("brand_ar"),
      en.getField("ldBrand").as("brand_en"),
      lit("").as("barcode"),
      nameAr.as("name_ar"),
      en.getField("ldName").as("name_en")) ++
      Seq("one", "two", "three", "four", "five", "six").zipWithIndex.map {
        case (w, i) => crumb(en, i + 1).as(s"category_${w}_eng") } ++
      Seq(lit("").as("category_seven_eng"), lit("").as("category_eight_eng"),
        lit("").as("category_nine_eng")) ++
      Seq("one", "two", "three", "four", "five", "six").zipWithIndex.map {
        case (w, i) => when(ar.isNull, lit("")).otherwise(crumb(ar, i + 1)).as(s"category_${w}_ar") } ++
      Seq(lit("").as("category_seven_ar"), lit("").as("category_eight_ar"),
        lit("").as("category_nine_ar"),
        when(swapped, paRaw).otherwise(pbRaw).as("price_before"),
        when(swapped, lit("")).otherwise(paRaw).as("price_after"),
        when(!swapped, lit(runDate)).otherwise(lit("")).as("offer_start_date"),
        lit("").as("offer_end_date"),
        coalesce(col("url_en"), lit("")).as("url"),
        lit("").as("brand_image_url"),
        en.getField("ldImage").as("image_url"),
        lit("Website").as("source_type"),
        lit(runDate).as("crawled_on"))
    pivoted
      .filter(en.isNotNull && en.getField("ldFound")) // NameError path dropped
      .select(cols ++ passThrough.map(col): _*)
      .select((Product.sinkOrder ++ passThrough).map(col): _*)
  }

  /** P18 — offer-nulling (seoudi:311-314 / spinneys:455-458): when the offer
    * price equals the regular price there is no offer. */
  def offerNulled(priceBefore: Column, priceAfter: Column): (Column, Column) = {
    val isNoOffer = priceAfter === priceBefore
    (priceBefore, when(isNoOffer, lit("")).otherwise(priceAfter))
  }

  /** P21 — brand lookup key (spinneys:399,445). */
  def brandKey(name: Column): Column = lower(regexp_replace(name, " ", ""))

  /** G1 — barcode split/explode (seoudi_extract_data.py:404-445): the
    * combined-barcode row PLUS one row per individual barcode when the
    * barcode field holds a ", "-separated list. */
  def explodeBarcodes(products: DataFrame): DataFrame =
    // one generator pass instead of `products UNION products.filter.explode`:
    // the union form scanned (and recomputed) the upstream plan twice; a
    // single-barcode row explodes its own 1-element array, a multi-barcode
    // row emits the combined value plus each split part — identical multiset
    products.select(products.columns.toSeq.map {
      case "barcode" =>
        explode(when(col("barcode").contains(", "),
            concat(array(col("barcode")), split(col("barcode"), ", ")))
          .otherwise(array(col("barcode")))).as("barcode")
      case c => col(c)
    }: _*)
}
