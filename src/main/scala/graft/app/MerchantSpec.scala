package graft.app

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.extract.{Extractors, GraphQLExtract}

/** Per-merchant wiring of the generic round engine — what differs between
  * the reference's per-site scripts once fetch/schedule/state are shared:
  * the language-normalized page join key, how a fetched page body becomes
  * extraction fields (HTML kernel vs GraphQL document), the 34-column
  * projection, the dedup/sink-row policy, the link-harvest rule, and what
  * counts as an EXTRACTION failure (a fetched page the reference's
  * except-path would retry, e.g. Metro's missing ld+json island ->
  * NameError, metro:116-182). */
final case class MerchantSpec(
    name: String,
    /** page url -> canonical join key (language variants collapse). */
    pageKey: Column => Column,
    /** (pivoted EN/AR frame, runDate, passThrough cols) -> 34-col Product. */
    project: (DataFrame, String, Seq[String]) => DataFrame,
    /** First-wins barcode dedup (within the round) before sink
      * (Seoudi/Carrefour style)? */
    dedupByBarcode: Boolean,
    /** Over the pivoted frame (en/ar structs): true = the reference would
      * throw during extraction; the URL re-enters the retry loop and is NOT
      * marked seen. */
    extractionFailed: Column,
    /** Page body -> `fields` struct: the HTML kernel for browser merchants,
      * the raw GraphQL document for API merchants. */
    pageFields: DataFrame => DataFrame = Extractors.withPageFields,
    /** Deduped per-round products -> sink rows (barcode split policy).
      * Default: combined row + per-barcode rows for ", "-separated lists. */
    sinkRows: DataFrame => DataFrame = Extractors.explodeBarcodes,
    /** Keep a harvested href as new frontier content? (P14/F5). */
    harvestFilter: Column => Column = href => href =!= "N/A" && href.startsWith("http"),
    /** Relative hrefs resolved against this base before the filter
      * (oscar_extract_product_urls.py:33-36); None = keep absolute only. */
    absolutizeBase: Option[String] = None,
    /** Run-global first-wins barcode gate (the reference's process-lifetime
      * `processed_barcodes` set, seoudi:20,359 / spinneys:12,510): a barcode
      * sunk in ANY earlier round or frontier (catalog vs deals) never sinks
      * again. Carrefour has no such set — per-round only. */
    barcodeRunGate: Boolean = false)

object MerchantSpec {

  /** GraphQL merchants: the fetched "page" body IS the response document;
    * fields = struct(doc), no HTML parse. */
  val graphqlPageFields: DataFrame => DataFrame =
    pages => pages.withColumn("fields", struct(decode(col("html"), "UTF-8").as("doc")))

  /** Carrefour (carrefour_extract_data.py): /ar/ <-> /en/ variants,
    * barcode-deduped per round, extraction never throws (every field has a
    * default), no run-global barcode set. */
  val carrefour: MerchantSpec = MerchantSpec(
    name = "Carrefour",
    pageKey = u => graft.plans.UrlCanonExpr.canon(regexp_replace(u, "/ar/", "/en/")),
    project = Extractors.carrefourProduct,
    dedupByBarcode = true,
    extractionFailed = lit(false))

  /** MetroMarkets (metro_markets_extract_product_data.py): /ar/product/
    * variants, no barcode dedup (barcode is hard-coded ''), and a page
    * without the ld+json island is the NameError failure path. */
  val metro: MerchantSpec = MerchantSpec(
    name = "MetroMarkets",
    pageKey = u => graft.plans.UrlCanonExpr.canon(regexp_replace(u, "/ar/product/", "/product/")),
    project = Extractors.metroProduct,
    dedupByBarcode = false,
    extractionFailed = col("en").isNull || !col("en").getField("ldFound"))

  /** Seoudi (seoudi_extract_data.py) through the engine: pages are GraphQL
    * detail documents keyed by the product url (one row per store/lang,
    * :202-272). A doc whose `data.product` is null models the reference's
    * failed-response path (:38-46) -> retry, not seen. Sink rows = the
    * combined-barcode row PLUS one row per split barcode, unconditionally
    * (:399-445). processed_barcodes is process-global (:20,359). */
  val seoudi: MerchantSpec = MerchantSpec(
    name = "Seoudi",
    pageKey = u => graft.plans.UrlCanonExpr.canon(u),
    project = (pivoted, runDate, passThrough) =>
      GraphQLExtract.seoudiProduct(
        pivoted.select(Seq(
          col("en").getField("doc").as("en_doc"),
          col("ar").getField("doc").as("ar_doc")) ++ passThrough.map(col): _*),
        runDate, "https://seoudisupermarket.com/en/", passThrough)
        .drop("__seq"),
    dedupByBarcode = true,
    extractionFailed = col("en").isNull ||
      GraphQLExtract.parseDetail(col("en").getField("doc")).isNull,
    pageFields = graphqlPageFields,
    sinkRows = df => df.unionByName(
      df.withColumn("barcode", explode(split(col("barcode"), ", ")))),
    barcodeRunGate = true)

  /** Spinneys (spinneys_extract_data.py) through the engine: GraphQL detail
    * docs like Seoudi, plus the brand-image broadcast probe (:445) against a
    * pre-fetched brand directory dim, the truthy-barcode gate (:510), one
    * sink row per product, and the slug (url path tail) as the url source
    * (:462). Used for BOTH the catalog and the deals frontier — the deals
    * drain calls the same fetch_product_details (:750). */
  def spinneys(brandDim: DataFrame): MerchantSpec = MerchantSpec(
    name = "Spinneys",
    pageKey = u => graft.plans.UrlCanonExpr.canon(u),
    project = (pivoted, runDate, passThrough) =>
      GraphQLExtract.spinneysProduct(
        pivoted.select(Seq(
          col("en").getField("doc").as("en_doc"),
          col("ar").getField("doc").as("ar_doc"),
          regexp_extract(col("url_norm"), "/en/(.+)$", 1).as("slug"),
          col("crawl_order").as("__seq")) ++ passThrough.map(col): _*),
        runDate, brandDim, passThrough = passThrough)
        .drop("__seq"),
    dedupByBarcode = true,
    extractionFailed = col("en").isNull ||
      GraphQLExtract.parseDetail(col("en").getField("doc")).isNull,
    pageFields = graphqlPageFields,
    sinkRows = df => df.filter(col("barcode") =!= ""),
    barcodeRunGate = true)

  /** Oscar (oscar_extract_product_urls.py): a URL-extraction merchant — the
    * reference's output IS the frontier (category, product url,
    * is_processed=False). Listing pages are parsed by the HTML kernel; the
    * harvest keeps hrefs containing `show_product` (:31) after resolving
    * relative ones against the store base (:33-36). No product projection
    * exists in the reference, so the engine sinks zero product rows and the
    * assertable output is the schedule/frontier content. */
  val oscar: MerchantSpec = MerchantSpec(
    name = "Oscar",
    pageKey = u => graft.plans.UrlCanonExpr.canon(u),
    project = (pivoted, runDate, passThrough) =>
      Extractors.carrefourProduct(pivoted, runDate, passThrough).limit(0),
    dedupByBarcode = false,
    extractionFailed = lit(false),
    harvestFilter = href => href.contains("show_product"),
    absolutizeBase = Some("https://www.oscarstores.com"))
}
