package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.app.CrawlEngine
import graft.gen.Synthetic
import graft.streaming.FrontierStream

class FrontierStreamSpec extends SparkTestBase {

  test("incremental ingest: files stream into the frontier, rounds drain them; re-ingest is exactly-once") {
    import spark.implicits._
    val root = Files.createTempDirectory("stream").toString
    val inDir = s"$root/incoming"
    val ckpt = s"$root/stream_ckpt"
    new java.io.File(inDir).mkdirs()

    val engine = new CrawlEngine(spark, s"$root/state",
      numPartitions = 4, defaultBudget = 1000, maxAttempts = 2)
    engine.init(Synthetic.frontier(spark, 0, 1).toDF()) // empty start

    // batch 1: ids 0..59 (raw shape, pre-enrichment)
    def rawBatch(from: Long, until: Long): Unit =
      spark.range(from, until, 1, 2).map { idBoxed =>
        val id: Long = idBoxed
        (Synthetic.category(id), Synthetic.url(id, "en"), false, id)
      }.toDF("category", "url", "is_processed", "discovered_seq")
        .write.mode("append").parquet(inDir)

    rawBatch(0, 60)
    FrontierStream.ingestAvailable(spark, engine, inDir, ckpt)
    val pages = Synthetic.pages(spark, 100, 2).toDF()
    val robots = Synthetic.robots(spark).toDF()
    val budgets = Synthetic.budgets(spark, 1000).toDF()
    engine.run(pages, robots, budgets, maxRounds = 20)
    val sched1 = engine.scheduleTable.read().get.select("url_norm").distinct().count()
    assert(sched1 >= 60, s"expected >=60 scheduled, got $sched1")

    // batch 2 arrives later: ids 60..99 + a re-delivery of batch 1's file
    // contents (same checkpoint -> the old file is NOT reprocessed)
    rawBatch(60, 100)
    FrontierStream.ingestAvailable(spark, engine, inDir, ckpt)
    engine.run(pages, robots, budgets, maxRounds = 20)
    val sched2 = engine.scheduleTable.read().get.select("url_norm").distinct().count()
    assert(sched2 > sched1)

    // exactly-once: ingesting again with the same checkpoint adds nothing
    FrontierStream.ingestAvailable(spark, engine, inDir, ckpt)
    val scheduled = engine.run(pages, robots, budgets, maxRounds = 5)
    val sched3 = engine.scheduleTable.read().get.select("url_norm").distinct().count()
    assert(sched3 == sched2, s"re-ingest scheduled new urls: $sched3 vs $sched2")

    // exactly-once for every url that has a page: once fetched, the seen
    // gate blocks any rescheduling. Dead links (no page) may legitimately
    // reappear when harvested again later — the reference keeps failures
    // pending forever (is_processed=False path, helpers.py:198-203)
    val pageKeys = pages
      .withColumn("url_key",
        graft.plans.UrlCanonExpr.canon(regexp_replace(col("url"), "/ar/", "/en/")))
      .select("url_key").distinct()
    val dupFetched = engine.scheduleTable.read().get
      .groupBy("url_norm").count().filter(col("count") > 1)
      .join(pageKeys, col("url_norm") === col("url_key"), "left_semi")
      .count()
    assert(dupFetched == 0, "a fetchable url was scheduled more than once")
  }
}
