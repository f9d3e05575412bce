package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: the full extraction pipeline (HTML kernel -> EN⋈AR pivot ->
    * 34-column Product projection) over a small deterministic synthetic
    * pages corpus, plus a sanity filter against the sf0.001 tables. */
  def entry(spark: SparkSession): DataFrame = {
    import graft.extract.Extractors
    import graft.url.UrlCanon
    val pages = graft.gen.Synthetic.pages(spark, 100, 4).toDF()
      .withColumn("url_norm",
        graft.plans.UrlCanonExpr.canon(regexp_replace(col("url"), "/ar/", "/en/")))
    val withFields = Extractors.withPageFields(pages)
    val pivoted = Extractors.pivotLangs(withFields, "url_norm")
      .withColumn("url_en", coalesce(col("url_en"), col("url_norm")))
    Extractors.carrefourProduct(pivoted, "2024-11-10")
  }

  /** One entry per implemented operator from SURVEY.md §2 + the
    * training-data-pipeline operators. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.GraftQueries.all

  /** DuckDB-equivalent SQL for each SQL-expressible query (identical output
    * column names + aligned types; integer-quantized floats). */
  def oracleSql: Map[String, String] =
    graft.queries.GraftQueries.oracles
}
