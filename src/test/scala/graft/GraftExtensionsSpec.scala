package graft

import org.apache.spark.sql.SparkSession

/** SQL-surface parity: the extension-registered functions must equal their
  * Column-API counterparts on a session wired via withExtensions. */
class GraftExtensionsSpec extends SparkTestBase {

  /** A sibling session on the same SparkContext with the extensions
    * injected (getOrCreate returns the existing session — and skips
    * extensions — unless the default/active slots are cleared first). */
  private lazy val extSpark: SparkSession = {
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .withExtensions(new graft.plans.GraftExtensions())
      .getOrCreate()
    SparkSession.setDefaultSession(base)
    SparkSession.setActiveSession(base)
    s
  }

  test("SQL functions equal the Column API kernels") {
    import org.apache.spark.sql.functions._
    val s = extSpark
    import s.implicits._
    val df = Seq(
      (1L, "https://Shop1.Example.COM:443/en/item-1/p/1#frag", "the quick brown fox jumps over the lazy dog"),
      (2L, "https://x.com/a?b=2&a=1", "p q r s t u v")).toDF("id", "url", "text")
    df.createOrReplaceTempView("pages_ext")
    val viaSql = s.sql(
      """SELECT id, url_canon(url) AS cu, url_canon_parts(url).host AS h,
        |  simhash64_native(split(text, ' ')) AS sh,
        |  minhash_shingled(split(text, ' '), 8, 3) AS mh
        |FROM pages_ext""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getSeq[Long](4)))
      .sortBy(_._1)
    val viaCols = df.select(col("id"),
        graft.plans.UrlCanonExpr.canon(col("url")),
        graft.plans.UrlCanonPartsExpr.canonParts(col("url")).getField("host"),
        graft.plans.SimHash64Expr.simhash64Native(split(col("text"), " ")),
        graft.plans.MinHashShingledExpr.minhashShingled(split(col("text"), " "), 8, 3))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getSeq[Long](4)))
      .sortBy(_._1)
    assert(viaSql.toSeq == viaCols.toSeq)
    assert(viaSql.head._2 == "https://shop1.example.com/en/item-1/p/1")
  }

  test("wrong arity and non-int literals surface readable analysis errors") {
    val s = extSpark
    import s.implicits._
    Seq("u").toDF("url").createOrReplaceTempView("arity_t")
    val e1 = intercept[Exception] { s.sql("SELECT url_canon() FROM arity_t").collect() }
    assert(e1.getMessage.contains("url_canon expects 1 argument(s), got 0"), e1.getMessage)
    val e2 = intercept[Exception] { s.sql("SELECT url_canon(url, url) FROM arity_t").collect() }
    assert(e2.getMessage.contains("url_canon expects 1 argument(s), got 2"), e2.getMessage)
    val e3 = intercept[Exception] {
      s.sql("SELECT minhash_shingled(split(url, ' '), url, 3) FROM arity_t").collect()
    }
    assert(e3.getMessage.contains("literal integer"), e3.getMessage)
    // BIGINT literals in range are accepted (SQL users plausibly write them)
    val ok = s.sql("SELECT minhash_shingled(split('a b c d', ' '), CAST(4 AS BIGINT), 2) AS mh")
      .collect().head.getSeq[Long](0)
    assert(ok.length == 4)
  }
}
