package graft

import org.apache.spark.sql.functions._
import graft.model.{FrontierEntry, RobotsRule}
import graft.politeness.Politeness

class PolitenessSpec extends SparkTestBase {

  private def entry(url: String, seq: Long): FrontierEntry = {
    import graft.url.UrlCanon
    val norm = UrlCanon.canonicalize(url)
    FrontierEntry("c", url, is_processed = false, norm,
      graft.util.Hashing.xxhash64(norm), UrlCanon.hostOf(norm),
      UrlCanon.depthOf(norm), 0, seq, 0)
  }

  test("robots: deny prefix filters, longest prefix wins, no-rule hosts default-allow") {
    import spark.implicits._
    val frontier = Seq(
      entry("https://a.com/private/x", 1),   // denied by /private
      entry("https://a.com/private/open/x", 2), // re-allowed by longer prefix
      entry("https://a.com/public/x", 3),    // allowed by /
      entry("https://norules.com/x", 4)      // no rules -> allow
    ).toDS().toDF()
    val robots = Seq(
      RobotsRule("a.com", "/", allow = true, 100),
      RobotsRule("a.com", "/private", allow = false, 100),
      RobotsRule("a.com", "/private/open", allow = true, 100)
    ).toDS().toDF()
    val kept = Politeness.applyRobots(frontier, robots)
      .select("discovered_seq").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L, 4L))
    // the 10^8-host escape hatch (shuffle join instead of broadcast) is
    // output-identical
    val keptShuffle = Politeness.applyRobots(frontier, robots, broadcastDim = false)
      .select("discovered_seq").collect().map(_.getLong(0)).toSet
    assert(keptShuffle == kept)
  }

  test("non-broadcast budget dim is output-identical (huge-dim escape hatch)") {
    import spark.implicits._
    val frontier = graft.gen.Synthetic.frontier(spark, 300, 4).toDF()
      .filter(!org.apache.spark.sql.functions.col("is_processed"))
    val budgets = graft.gen.Synthetic.budgets(spark, 10).toDF()
    def run(bc: Boolean) = Politeness.applyBudgets(frontier, budgets, 10, broadcastDim = bc)
      .select("url_hash", "scheduled_now").collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).sortBy(_._1).toSeq
    assert(run(true) == run(false))
    spark.catalog.clearCache()
  }

  test("two-phase budget equals single-window budget on a skewed frontier") {
    import org.apache.spark.sql.expressions.Window
    val f = graft.gen.Synthetic.frontier(spark, 3000, 4).toDF()
      .filter(!col("is_processed")).dropDuplicates("url_hash")
    val budgets = graft.gen.Synthetic.budgets(spark, 37).toDF()
    val got = Politeness.applyBudgets(f, budgets, 37)
      .filter(col("scheduled_now")).select("url_hash")
      .collect().map(_.getLong(0)).toSet
    // single-window reference
    val w = Window.partitionBy(col("host"))
      .orderBy(col("host_rank"), col("depth"), col("discovered_seq"), col("url_hash"))
    val want = f.withColumn("rn", row_number().over(w)).filter(col("rn") <= 37)
      .select("url_hash").collect().map(_.getLong(0)).toSet
    assert(got == want)
    spark.catalog.clearCache()
  }

  test("budgets from crawl_delay: round duration / strictest delay, floor >= 1") {
    import spark.implicits._
    val robots = Seq(
      ("a.com", "/", true, 1000),    // 60000/1000 = 60
      ("a.com", "/x", false, 250),   // max delay wins -> still 1000
      ("b.com", "/", true, 40000),   // 60000/40000 = 1
      ("c.com", "/", true, 70000),   // floor 0 -> clamped to 1
      ("d.com", "/", true, 0))       // delay 0 -> treated as 1ms -> 60000
      .toDF("host", "path_prefix", "allow", "crawl_delay_ms")
    val got = Politeness.budgetsFromCrawlDelay(robots, 60000L)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == Map("a.com" -> 60, "b.com" -> 1, "c.com" -> 1, "d.com" -> 60000))
  }
}
