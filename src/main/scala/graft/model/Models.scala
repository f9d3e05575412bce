package graft.model

import java.sql.Timestamp

/** Core engine row types (SURVEY.md §1). */

/** Input page row — BASELINE.json input_hint shape:
  * (url, warc_ts, html binary, text, lang). */
final case class Page(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** Frontier entry — reference CSV shape (category,url,is_processed)
  * (scripts/utils/helpers.py:104-176) extended with engine-derived
  * scheduling columns. */
final case class FrontierEntry(
    category: String,
    url: String,
    is_processed: Boolean,
    url_norm: String,
    url_hash: Long,
    host: String,
    depth: Int,
    host_rank: Int,
    discovered_seq: Long,
    attempt: Int)

/** Crawl seed (scripts/extractions/MetroMarkets/category_urls.json shape). */
final case class Seed(category: String, url: String, rank: Int)

/** robots.txt rule row — host + path-prefix allow/deny + crawl delay
  * (bookscraper/bookscraper/settings.py:20,22-31 semantics). */
final case class RobotsRule(host: String, path_prefix: String, allow: Boolean, crawl_delay_ms: Int)

/** Per-host politeness budget per round (the 1s/page pacing of
  * metro_markets_extract_product_urls.py:91 re-expressed as a per-round
  * URL quota). */
final case class HostBudget(host: String, per_round: Int)

/** The 34-field output record, sink order of
  * scripts/utils/helpers.py:39-49 ("Brand Url" before "Picture"). */
final case class Product(
    merchant: String, product_id: String, brand_ar: String, brand_en: String,
    barcode: String, name_ar: String, name_en: String,
    category_one_eng: String, category_two_eng: String, category_three_eng: String,
    category_four_eng: String, category_five_eng: String, category_six_eng: String,
    category_seven_eng: String, category_eight_eng: String, category_nine_eng: String,
    category_one_ar: String, category_two_ar: String, category_three_ar: String,
    category_four_ar: String, category_five_ar: String, category_six_ar: String,
    category_seven_ar: String, category_eight_ar: String, category_nine_ar: String,
    price_before: String, price_after: String,
    offer_start_date: String, offer_end_date: String,
    url: String, brand_image_url: String, image_url: String,
    source_type: String, crawled_on: String)

object Product {
  /** Sink column order — helpers.py:52-65 attribute list (brand_image_url
    * precedes image_url, matching "Brand Url" col 31 / "Picture" col 32). */
  val sinkOrder: Seq[String] = Seq(
    "merchant", "product_id", "brand_ar", "brand_en", "barcode", "name_ar", "name_en",
    "category_one_eng", "category_two_eng", "category_three_eng", "category_four_eng",
    "category_five_eng", "category_six_eng", "category_seven_eng", "category_eight_eng",
    "category_nine_eng",
    "category_one_ar", "category_two_ar", "category_three_ar", "category_four_ar",
    "category_five_ar", "category_six_ar", "category_seven_ar", "category_eight_ar",
    "category_nine_ar",
    "price_before", "price_after", "offer_start_date", "offer_end_date",
    "url", "brand_image_url", "image_url", "source_type", "crawled_on")

  /** Excel header names — helpers.py:39-49. */
  val sinkHeaders: Seq[String] = Seq(
    "Merchant", "Id", "Brand ar", "Brand en", "Barcode", "Item Name AR", "Item Name EN",
    "Category 1 EN", "Category 2 EN", "Category 3 EN", "Category 4 EN", "Category 5 EN",
    "Category 6 EN", "Category 7 EN", "Category 8 EN", "Category 9 EN",
    "Category 1 AR", "Category 2 AR", "Category 3 AR", "Category 4 AR", "Category 5 AR",
    "Category 6 AR", "Category 7 AR", "Category 8 AR", "Category 9 AR",
    "Price before", "Price after", "Offer start date", "Offer end date",
    "Url", "Brand Url", "Picture", "Type", "Crawled on")
}

/** One scheduled fetch emitted by the frontier drain. */
final case class ScheduledUrl(
    crawl_order: Long, round: Int, host: String, url_norm: String,
    url: String, category: String, attempt: Int)

/** Per-partition lineage/metrics row recorded at each snapshot commit. */
final case class PartitionLineage(
    round: Int, partition_id: Int, host_count: Long, url_count: Long,
    min_url_hash: Long, max_url_hash: Long)
