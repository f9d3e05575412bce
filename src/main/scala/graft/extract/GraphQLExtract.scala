package graft.extract

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The GraphQL-payload extraction surface of the reference (SURVEY.md §2.2
  * P18-P22, §3.2): Seoudi/Spinneys fetch deeply nested product JSON
  * (products list query seoudi_extract_data.py:89-176, detail query
  * :202-272) and pluck fields with `.get()` chains. Spark-native form: a
  * `docs(doc: String)` table + `from_json` with an explicit nested schema +
  * null-safe struct/array access — all codegen'd, no UDFs.
  */
object GraphQLExtract {

  /** Nested schema mirroring the reference's detail-query response
    * (seoudi_extract_data.py:213-269: sku, name, url_key, brand{name},
    * categories[{name,level,url_path}], price_range{maximum_price
    * {final_price{value}, regular_price{value}}}, attributes[{key,value}],
    * special_from_date/special_to_date, thumbnail{url}). */
  val productSchema: StructType = StructType.fromDDL(
    """data STRUCT<products: STRUCT<items: ARRAY<STRUCT<
      |  sku: STRING, name: STRING, url_key: STRING,
      |  special_from_date: STRING, special_to_date: STRING,
      |  brand: STRUCT<name: STRING>,
      |  thumbnail: STRUCT<url: STRING>,
      |  categories: ARRAY<STRUCT<name: STRING, level: INT, url_path: STRING>>,
      |  price_range: STRUCT<maximum_price: STRUCT<
      |    final_price: STRUCT<value: DOUBLE>,
      |    regular_price: STRUCT<value: DOUBLE>>>,
      |  attributes: ARRAY<STRUCT<key: STRING, value: STRING>>
      |>>>>""".stripMargin)

  /** Parse a JSON document column into the typed product item (first item of
    * the list — the detail query returns exactly one,
    * seoudi_extract_data.py:278-282). */
  def parseItem(doc: Column): Column =
    try_element_at(from_json(doc, productSchema).getField("data")
      .getField("products").getField("items"), lit(1))

  /** P20 — safe category name at position i (1-based): `categories[i].name`
    * if present else null->'' (seoudi:349-357, spinneys safe_get_category_name
    * :465-466). element_at is null-safe by construction. */
  def safeCategoryName(item: Column, i: Int): Column =
    coalesce(try_element_at(item.getField("categories"), lit(i)).getField("name"), lit(""))

  /** P19 — barcode concat (seoudi:297-304): sku + ", " + alternative_skus
    * attribute when present and distinct from sku. */
  def barcodeConcat(item: Column): Column = {
    val sku = item.getField("sku")
    val alt = try_element_at(
      filter(item.getField("attributes"), a => a.getField("key") === "alternative_skus"), lit(1))
      .getField("value")
    when(alt.isNotNull && alt =!= sku, concat_ws(", ", sku, alt)).otherwise(sku)
  }

  /** P18 — offer nulling (seoudi:307-314): when final == regular there is no
    * offer; price_after/start/end become empty. Returns
    * (price_before, price_after, offer_start, offer_end) as formatted
    * strings, prices at 2 decimals like the reference's stringified floats. */
  def offerColumns(item: Column): (Column, Column, Column, Column) = {
    val finalP = item.getField("price_range").getField("maximum_price")
      .getField("final_price").getField("value")
    val regP = item.getField("price_range").getField("maximum_price")
      .getField("regular_price").getField("value")
    val noOffer = finalP === regP
    // DECIMAL(18,2) string form — format_number would insert grouping
    // separators (e.g. "1,234.56") the reference's raw floats never carry
    val fmt = (c: Column) => c.cast("decimal(18,2)").cast("string")
    (fmt(regP),
      when(noOffer, lit("")).otherwise(fmt(finalP)),
      when(noOffer, lit("")).otherwise(coalesce(item.getField("special_from_date"), lit(""))),
      when(noOffer, lit("")).otherwise(coalesce(item.getField("special_to_date"), lit(""))))
  }

  /** P22 — url synthesis (seoudi:317): prefix + url_key. */
  def synthesizeUrl(item: Column, prefix: String): Column =
    concat(lit(prefix), item.getField("url_key"))

  /** Full pluck projection over a docs(doc string) table: one row per
    * document with the reference's field set (merchant-neutral subset). */
  def pluckProducts(docs: DataFrame, urlPrefix: String): DataFrame = {
    val item = parseItem(col("doc"))
    val (pb, pa, os, oe) = offerColumns(item)
    val cols: Seq[Column] = Seq(
      coalesce(item.getField("sku"), lit("")).as("sku"),
      coalesce(item.getField("name"), lit("")).as("name"),
      coalesce(item.getField("brand").getField("name"), lit("")).as("brand"),
      barcodeConcat(item).as("barcode")) ++
      (1 to 9).map(i => safeCategoryName(item, i).as(s"category_$i")) ++
      Seq(pb.as("price_before"), pa.as("price_after"),
        os.as("offer_start_date"), oe.as("offer_end_date"),
        synthesizeUrl(item, urlPrefix).as("url"),
        coalesce(item.getField("thumbnail").getField("url"), lit("")).as("image_url"))
    docs.select(cols: _*)
  }

  /** G1 — per-barcode explode AFTER the pluck (seoudi:404-445): combined row
    * plus one row per split barcode. */
  def withBarcodeRows(products: DataFrame): DataFrame =
    Extractors.explodeBarcodes(products)

  // ---------------- full 34-column Seoudi detail projection ----------------

  /** Detail-response schema — the reference's detail query returns a SINGLE
    * `data.product` object (seoudi_extract_data.py:213-269, consumed at
    * :284: `.json().get('data', {}).get('product', {})`), unlike the list
    * query's `items` array. */
  val detailSchema: StructType = StructType.fromDDL(
    """data STRUCT<product: STRUCT<
      |  id: LONG, sku: STRING, name: STRING, url_key: STRING,
      |  special_from_date: STRING, special_to_date: STRING,
      |  brand: STRUCT<name: STRING>,
      |  thumbnail: STRUCT<url: STRING>,
      |  categories: ARRAY<STRUCT<name: STRING, level: INT, url_path: STRING>>,
      |  price_range: STRUCT<maximum_price: STRUCT<
      |    final_price: STRUCT<value: DOUBLE>,
      |    regular_price: STRUCT<value: DOUBLE>>>,
      |  attributes: ARRAY<STRUCT<key: STRING, value: STRING>>
      |>>""".stripMargin)

  def parseDetail(doc: Column): Column =
    from_json(doc, detailSchema).getField("data").getField("product")

  /** Price -> string exactly once, no grouping separators: DECIMAL(18,2)
    * canonical form ("1234.56"), '' for null (the reference keeps raw floats
    * and the sink writes '' for None; format_number would insert thousands
    * separators the reference never produces). */
  def priceStr(c: Column): Column =
    when(c.isNull, lit("")).otherwise(c.cast("decimal(18,2)").cast("string"))

  /** The full 34-column Seoudi Product from an EN detail doc + optional AR
    * detail doc (seoudi_extract_data.py:275-399):
    *  - categories are 0-BASED here (category_one = categories[0], :317-328
    *    — unlike the Carrefour/Metro breadcrumb off-by-one);
    *  - P18 offer-nulling (:307-314): final == regular -> price_after,
    *    offer_start, offer_end all empty (null-safe ==, mirroring Python);
    *  - P19 barcode concat (:297-304); P22 url synthesis (:317);
    *  - the AR side contributes name/brand/categories only (:338-357), all
    *    None when the AR fetch failed (ar_doc null, :333-336).
    * Input: DataFrame with `en_doc` and nullable `ar_doc` string columns.
    * Output adds `__seq` (the EN doc's product id) for the caller's
    * deterministic first-wins barcode dedup (processed_barcodes, :359-361).
    */
  def seoudiProduct(docs: DataFrame, runDate: String, urlPrefix: String,
      passThrough: Seq[String] = Nil): DataFrame = {
    val en = parseDetail(col("en_doc"))
    val ar = parseDetail(col("ar_doc"))
    def s(c: Column): Column = coalesce(c, lit(""))
    def cat(side: Column, i: Int): Column =
      s(try_element_at(side.getField("categories"), lit(i)).getField("name"))
    val finalP = en.getField("price_range").getField("maximum_price")
      .getField("final_price").getField("value")
    val regP = en.getField("price_range").getField("maximum_price")
      .getField("regular_price").getField("value")
    val noOffer = finalP <=> regP
    val words = Seq("one", "two", "three", "four", "five", "six", "seven", "eight", "nine")
    val cols: Seq[Column] = Seq(
      lit("Seoudi").as("merchant"),
      s(en.getField("id").cast("string")).as("product_id"),
      s(ar.getField("brand").getField("name")).as("brand_ar"),
      s(en.getField("brand").getField("name")).as("brand_en"),
      barcodeConcat(en).as("barcode"),
      s(ar.getField("name")).as("name_ar"),
      s(en.getField("name")).as("name_en")) ++
      words.zipWithIndex.map { case (w, i) => cat(en, i + 1).as(s"category_${w}_eng") } ++
      words.zipWithIndex.map { case (w, i) => cat(ar, i + 1).as(s"category_${w}_ar") } ++
      Seq(
        priceStr(regP).as("price_before"),
        when(noOffer, lit("")).otherwise(priceStr(finalP)).as("price_after"),
        when(noOffer, lit("")).otherwise(s(en.getField("special_from_date"))).as("offer_start_date"),
        when(noOffer, lit("")).otherwise(s(en.getField("special_to_date"))).as("offer_end_date"),
        concat(lit(urlPrefix), s(en.getField("url_key"))).as("url"),
        lit("").as("brand_image_url"),
        s(en.getField("thumbnail").getField("url")).as("image_url"),
        lit("Website").as("source_type"),
        lit(runDate).as("crawled_on"),
        en.getField("id").as("__seq")) ++ passThrough.map(col)
    docs.select(cols: _*)
  }

  // ---------------- full 34-column Spinneys detail projection --------------

  /** S7/A6 — the Spinneys brand directory -> lookup dim
    * (spinneys_extract_data.py:338-414 fetch_brands): entries enter the
    * lookup only when BOTH name and image_url are truthy (:401), key =
    * lowercase despaced name (:399), and a later fetch overwrites an earlier
    * one (dict assignment) -> last-wins by fetch order. Input: (name,
    * image_url, fetch_seq). Output: (brand_key, image_url) — broadcast-sized
    * (a merchant has thousands of brands, not billions). */
  def spinneysBrandDim(brands: DataFrame): DataFrame =
    brands
      .filter(col("name").isNotNull && col("name") =!= "" &&
        col("image_url").isNotNull && col("image_url") =!= "")
      .groupBy(Extractors.brandKey(col("name")).as("brand_key"))
      .agg(max_by(col("image_url"), col("fetch_seq")).as("image_url"))

  /** The full 34-column Spinneys Product from EN + optional AR detail docs
    * (spinneys_extract_data.py:416-554). Differences from [[seoudiProduct]],
    * each reproduced exactly:
    *  - barcode = the raw sku, NO alternative_skus concat (:439) and no
    *    split rows — the sink writes one row per product (:552);
    *  - brand_image_url = the brand-directory broadcast probe (:445, J2):
    *    key = lower(despace(brand_en)), miss or empty brand -> '';
    *  - url = prefix + the FRONTIER slug (:462 — the detail response carries
    *    no url_key), so docs must supply a `slug` column;
    *  - same 9-level 0-based safe_get_category_name (:465-476,500-508), same
    *    offer-nulling incl. the both-None case (:455-458, null-safe ==).
    * Input: DataFrame with `en_doc`, nullable `ar_doc`, `slug`, `__seq`
    * (processing-order column for the first-wins barcode gate, :510-511).
    */
  def spinneysProduct(
      docs: DataFrame,
      runDate: String,
      brandDim: DataFrame,
      urlPrefix: String = "https://spinneys-egypt.com/en/",
      passThrough: Seq[String] = Nil): DataFrame = {
    val en = parseDetail(col("en_doc"))
    val ar = parseDetail(col("ar_doc"))
    def s(c: Column): Column = coalesce(c, lit(""))
    def cat(side: Column, i: Int): Column =
      s(try_element_at(side.getField("categories"), lit(i)).getField("name"))
    val finalP = en.getField("price_range").getField("maximum_price")
      .getField("final_price").getField("value")
    val regP = en.getField("price_range").getField("maximum_price")
      .getField("regular_price").getField("value")
    val noOffer = finalP <=> regP
    val brandEn = en.getField("brand").getField("name")
    val words = Seq("one", "two", "three", "four", "five", "six", "seven", "eight", "nine")
    val cols: Seq[Column] = Seq(
      lit("Spinneys").as("merchant"),
      s(en.getField("id").cast("string")).as("product_id"),
      s(ar.getField("brand").getField("name")).as("brand_ar"),
      s(brandEn).as("brand_en"),
      s(en.getField("sku")).as("barcode"),
      s(ar.getField("name")).as("name_ar"),
      s(en.getField("name")).as("name_en")) ++
      words.zipWithIndex.map { case (w, i) => cat(en, i + 1).as(s"category_${w}_eng") } ++
      words.zipWithIndex.map { case (w, i) => cat(ar, i + 1).as(s"category_${w}_ar") } ++
      Seq(
        priceStr(regP).as("price_before"),
        when(noOffer, lit("")).otherwise(priceStr(finalP)).as("price_after"),
        when(noOffer, lit("")).otherwise(s(en.getField("special_from_date"))).as("offer_start_date"),
        when(noOffer, lit("")).otherwise(s(en.getField("special_to_date"))).as("offer_end_date"),
        concat(lit(urlPrefix), col("slug")).as("url"),
        Extractors.brandKey(brandEn).as("__brand_key"),
        s(en.getField("thumbnail").getField("url")).as("image_url"),
        lit("Website").as("source_type"),
        lit(runDate).as("crawled_on"),
        col("__seq")) ++ passThrough.map(col)
    docs.select(cols: _*)
      .join(broadcast(brandDim.select(col("brand_key").as("__brand_key"),
        col("image_url").as("__brand_image"))), Seq("__brand_key"), "left_outer")
      .withColumn("brand_image_url",
        when(col("brand_en") === "", lit(""))
          .otherwise(coalesce(col("__brand_image"), lit(""))))
      .drop("__brand_key", "__brand_image")
      .select(graft.model.Product.sinkOrder.map(col) ++
        (Seq("__seq") ++ passThrough).map(col): _*)
  }

  /** Spinneys sink rows: truthy-barcode gate + first-wins barcode dedup in
    * processing order (:510-511); ONE row per kept product — no per-barcode
    * explode (unlike Seoudi's :399-445 split loop). */
  def spinneysSinkRows(products34seq: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("barcode")).orderBy(col("__seq"))
    products34seq
      .filter(col("barcode") =!= "")
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .drop("__rn", "__seq")
  }

  /** First-wins barcode gate + the reference's sink rows: the processed_
    * barcodes set keeps the FIRST product per barcode in crawl order
    * (:359-361), then writes the combined-barcode row PLUS one row per split
    * barcode — even for single-barcode products (:399-445: the combined
    * write and the unconditional split loop). */
  def seoudiSinkRows(products34seq: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("barcode")).orderBy(col("__seq"))
    val kept = products34seq
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .drop("__rn", "__seq")
    // combined row + one row per split barcode as ONE generator over the
    // kept rows: the earlier `kept UNION kept.explode(...)` duplicated the
    // whole parse+window subtree (2 scans, 2 exchanges, 2 windows — the
    // exchanges are not plan-identical, so ReuseExchange never fired);
    // explode(array(combined) ++ split) emits the identical row multiset
    // from a single pass. The split side is coalesced to an empty array so
    // a NULL barcode (doc with no sku) keeps its combined row exactly as
    // the union form did — concat(x, NULL) is NULL and explode(NULL) would
    // silently drop the product.
    kept.select(kept.columns.toSeq.map {
      case "barcode" =>
        explode(concat(array(col("barcode")),
          coalesce(split(col("barcode"), ", "), array().cast("array<string>"))))
          .as("barcode")
      case c => col(c)
    }: _*)
  }

  // ---------------- S5: paginated list scan + count barrier ----------------

  /** List-response schema (seoudi:128-199 / spinneys:100-240: the list query
    * returns `data.connection.{nodes, total_count}` per page). */
  val listSchema: StructType = StructType.fromDDL(
    """data STRUCT<connection: STRUCT<
      |  total_count: INT,
      |  nodes: ARRAY<STRUCT<url_key: STRING, sku: STRING, name: STRING>>
      |>>""".stripMargin)

  /** S5 — explode a table of list-response pages (category, page_no, doc)
    * into one row per node, preserving crawl order as (category, page_no,
    * position-in-page) — the reference's sequential drain order. */
  def listNodes(pages: DataFrame): DataFrame = {
    val conn = from_json(col("doc"), listSchema).getField("data").getField("connection")
    pages
      .select(col("category"), col("page_no"), posexplode(conn.getField("nodes")).as(Seq("pos", "n")))
      .select(col("category"), col("page_no"), col("pos"),
        col("n.url_key").as("url_key"), col("n.sku").as("sku"), col("n.name").as("name"))
  }

  /** A3/S5 — the pagination count barrier as data validation: per category,
    * retrieved node count vs the response's total_count; `complete` mirrors
    * the reference's `total_retrieved >= total_count` stop condition
    * (spinneys:235-238) — false means a page is missing and the category
    * must be re-fetched. */
  def paginationAudit(pages: DataFrame): DataFrame = {
    val conn = from_json(col("doc"), listSchema).getField("data").getField("connection")
    pages
      .select(col("category"),
        size(conn.getField("nodes")).as("__n"),
        conn.getField("total_count").as("__total"))
      .groupBy(col("category"))
      .agg(sum(col("__n")).as("retrieved"), max(col("__total")).as("total_count"))
      .withColumn("complete", col("retrieved") >= col("total_count"))
  }

  // ---------------- G3: ConfigurableProduct variants explode ---------------

  /** Variants fragment schema — spinneys_extract_data.py:667-704 (`... on
    * ConfigurableProduct { variants { attributes { code } product { name sku
    * special_price url_key ... } } }`). */
  val variantsSchema: StructType = StructType.fromDDL(
    """data STRUCT<product: STRUCT<sku: STRING, name: STRING,
      |  variants: ARRAY<STRUCT<
      |    attributes: ARRAY<STRUCT<code: STRING>>,
      |    product: STRUCT<name: STRING, sku: STRING, url_key: STRING,
      |      special_price: DOUBLE>>>
      |>>""".stripMargin)

  /** G3 — one row per ConfigurableProduct variant via explode_outer: simple
    * products (no/empty variants array) keep one row with empty variant
    * fields, configurables fan out to their variant products. Input: (doc
    * string [+ passthrough cols]); parent sku/name come from the outer
    * product. */
  def explodeVariants(docs: DataFrame, passThrough: Seq[String] = Nil): DataFrame = {
    val item = from_json(col("doc"), variantsSchema).getField("data").getField("product")
    val v = col("v").getField("product")
    docs.select(passThrough.map(col) ++ Seq(
        item.getField("sku").as("parent_sku"),
        item.getField("name").as("parent_name"),
        explode_outer(item.getField("variants")).as("v")): _*)
      .select(passThrough.map(col) ++ Seq(
        col("parent_sku"), col("parent_name"),
        coalesce(v.getField("sku"), lit("")).as("variant_sku"),
        coalesce(v.getField("name"), lit("")).as("variant_name"),
        coalesce(v.getField("url_key"), lit("")).as("variant_url_key")): _*)
  }

  // -------------------- deterministic synthetic corpus --------------------

  /** Synthetic GraphQL detail documents exercising every branch: null brand
    * (seoudi:287-288), >9 categories, missing categories, final==regular
    * (offer nulling), alternative_skus present/equal/absent. */
  def syntheticDocs(spark: SparkSession, n: Long, numPartitions: Int = 8): DataFrame = {
    import spark.implicits._
    import graft.gen.Synthetic.mix2
    spark.range(0, n, 1, numPartitions).map { idBoxed =>
      val id: Long = idBoxed
      val sku = s"SKU-$id"
      val nCats = (mix2(id, 1) % 12).abs.toInt // up to 11 -> exercises >9
      val cats = (0 until nCats).map(i =>
        s"""{"name":"Cat-${(mix2(id, 10 + i) % 30).abs}","level":${i + 2},"url_path":"c$i"}""")
        .mkString("[", ",", "]")
      val brand =
        if ((mix2(id, 2) & 3) == 0) "null"
        else s"""{"name":"Brand-${(mix2(id, 3) % 25).abs}"}"""
      val regular = ((mix2(id, 4) % 90000).abs + 1000) / 100.0
      val hasOffer = (mix2(id, 5) & 3) == 0
      val fin = if (hasOffer) regular - ((mix2(id, 6) % 500).abs + 1) / 100.0 else regular
      val altCase = (mix2(id, 7) % 3).abs
      val attrs = altCase match {
        case 0 => s"""[{"key":"alternative_skus","value":"ALT-$id"}]"""
        case 1 => s"""[{"key":"alternative_skus","value":"$sku"}]""" // equal -> no concat
        case _ => s"""[{"key":"color","value":"red"}]"""
      }
      val doc =
        s"""{"data":{"products":{"items":[{"sku":"$sku","name":"Item $id",
           |"url_key":"item-$id","special_from_date":"2024-11-01",
           |"special_to_date":"2024-11-30","brand":$brand,
           |"thumbnail":{"url":"https://img/i$id.jpg"},
           |"categories":$cats,
           |"price_range":{"maximum_price":{"final_price":{"value":$fin},
           |"regular_price":{"value":$regular}}},
           |"attributes":$attrs}]}}}""".stripMargin.replace("\n", "")
      (id, doc)
    }.toDF("doc_id", "doc")
  }
}
