package graft.app

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.extract.Extractors

/** Per-merchant wiring of the generic round engine — what differs between
  * the reference's per-site scripts once fetch/schedule/state are shared:
  * the language-normalized page join key, the 34-column projection, whether
  * products dedup by barcode, and what counts as an EXTRACTION failure (a
  * fetched page the reference's except-path would retry, e.g. Metro's
  * missing ld+json island -> NameError, metro:116-182). */
final case class MerchantSpec(
    name: String,
    /** page url -> canonical join key (language variants collapse). */
    pageKey: Column => Column,
    /** (pivoted EN/AR frame, runDate, passThrough cols) -> 34-col Product. */
    project: (DataFrame, String, Seq[String]) => DataFrame,
    /** First-wins barcode dedup before sink (Seoudi/Carrefour style)? */
    dedupByBarcode: Boolean,
    /** Over the pivoted frame (en/ar structs): true = the reference would
      * throw during extraction; the URL re-enters the retry loop and is NOT
      * marked seen. */
    extractionFailed: Column)

object MerchantSpec {

  /** Carrefour (carrefour_extract_data.py): /ar/ <-> /en/ variants,
    * barcode-deduped, extraction never throws (every field has a default). */
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
}
