package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Frontier / seed sources (SURVEY.md §2.1 S1-S3).
  *
  * The reference's frontier files are CSVs with header
  * `Main Category,URL,is_processed` (Carrefour,
  * extractions/Carrefour/extract_carrefour_urls_19_09_2024.csv:1) or
  * `Category,Product URL,is_processed` (Metro/Oscar,
  * metro_markets_extract_product_urls.py:33). Pending semantics
  * (helpers.py:104-117): a row is pending when the flag column is missing,
  * empty/whitespace, or case-insensitively 'false'. File row order IS the
  * crawl priority (the reference drains top-to-bottom,
  * carrefour_extract_data.py:216).
  */
object FrontierSources {

  /** Read a reference-shaped frontier CSV. Column names are normalized to
    * (category, url, is_processed raw string); `discovered_seq` preserves
    * file order via monotonically_increasing_id — ids are not contiguous but
    * ARE ascending in file order (partition splits follow file offsets), and
    * the scheduler only needs the order, never the values. */
  def readFrontierCsv(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .csv(path)
    val cols = raw.columns
    val catCol = cols(0)
    val urlCol = cols(1)
    val withFlag =
      if (cols.length > 2) raw.withColumnRenamed(cols(2), "__flag")
      else raw.withColumn("__flag", lit(null).cast("string"))
    withFlag
      .withColumn("discovered_seq", monotonically_increasing_id())
      .select(
        col(catCol).as("category"),
        col(urlCol).as("url"),
        // helpers.py:113: pending when missing / '' / 'false' (any case)
        (!coalesce(lower(trim(col("__flag"))), lit("")).isin("", "false")).as("is_processed"),
        col("discovered_seq"))
      .filter(col("url").isNotNull)
  }

  /** Pending URLs in crawl order — the exact read_urls_from_csv projection
    * (helpers.py:104-117). */
  def pendingUrls(frontier: DataFrame): DataFrame =
    frontier.filter(!col("is_processed")).select("url", "discovered_seq")

  /** The Carrefour category TREE json (bookscraper/.../Carrefour_Spider.py:
    * 62-99 -> data.json): a 2-level map
    * `{cat: {Name, Xpath, "Sub-Categories Xpaths": {sub: {Name, "Sub Xpath"}}}}`
    * flattened to one row per (category, sub_category); categories without
    * sub-entries keep one row with empty sub fields. */
  def readCategoryTree(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.types._
    val subSchema = MapType(StringType, StructType(Seq(
      StructField("Name", StringType), StructField("Sub Xpath", StringType))))
    val topSchema = MapType(StringType, StructType(Seq(
      StructField("Name", StringType), StructField("Xpath", StringType),
      StructField("Sub-Categories Xpaths", subSchema))))
    val raw = spark.read.option("wholetext", "true").text(path)
      .select(from_json(col("value"), topSchema).as("m"))
    raw.select(explode(col("m")).as(Seq("category", "v")))
      .select(col("category"), col("v.Name").as("category_name"),
        col("v.Xpath").as("category_xpath"),
        explode_outer(col("v.`Sub-Categories Xpaths`")).as(Seq("sub_category", "sv")))
      .select(col("category"), col("category_name"), col("category_xpath"),
        coalesce(col("sub_category"), lit("")).as("sub_category"),
        coalesce(col("sv.Name"), lit("")).as("sub_name"),
        coalesce(col("sv.`Sub Xpath`"), lit("")).as("sub_xpath"))
  }

  /** S2 — category-seed JSON: {"categories":[{"name":..,"url":..}]}
    * (metro_markets_extract_category_urls.py:52-53) or the Oscar key variant
    * {"categories":[{"category":..,"url":..}]} (oscar_extract_category_urls
    * .py:65,72-73). Rank = array position (crawl priority). */
  def readSeedJson(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("multiLine", "true").json(path)
    val exploded = raw.select(posexplode(col("categories")).as(Seq("rank", "c")))
    val fields = exploded.select(col("rank"), col("c.*")).columns.toSet
    val nameCol = if (fields.contains("name")) "c.name" else "c.category"
    exploded.select(
      col(nameCol).as("category"),
      col("c.url").as("url"),
      col("rank").cast("int").as("rank"))
  }
}
