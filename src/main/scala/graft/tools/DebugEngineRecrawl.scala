package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Steady-state evidence for the CHECKPOINTED re-crawl gate (BASELINE.md
  * "Engine integration"): per-round work must be bounded by the window, not
  * the seen history. A fixed universe of `3 * B` URLs rotates in three
  * batches under window w = 3 — from round 4 on, each round re-ingests
  * exactly the batch whose stamps expired that round, so every round
  * schedules exactly B re-crawls while the seen table grows by B rows per
  * round (re-stamps accumulate, pages stay constant). A flat per-round wall
  * + flat shuffle bytes as seen grows is the claim; a slope ∝ seen would
  * falsify it. Also asserts the expiry count is EXACT every round.
  *
  * Usage: runMain graft.tools.DebugEngineRecrawl [B] [rounds]
  */
object DebugEngineRecrawl {
  def main(args: Array[String]): Unit = {
    val B = args.headOption.map(_.toLong).getOrElse(200000L)
    val rounds = args.lift(1).map(_.toInt).getOrElse(12)
    val w = 3
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val shufBytes = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          shufBytes.addAndGet(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    def url(idCol: org.apache.spark.sql.Column) =
      concat(lit("https://spinneys-egypt.com/en/item-"), idCol)
    def doc(ar: Boolean) = concat(
      lit("""{"data":{"product":{"id":"""), col("id"),
      lit(s""","sku":"R"""), col("id"),
      lit(s"""","name":"${if (ar) "AR " else ""}Prod """), col("id"),
      lit("""","brand":null,"thumbnail":{"url":"https://img/r.jpg"},"""),
      lit(""""categories":[{"name":"C"}],"price_range":{"maximum_price":"""),
      lit("""{"final_price":{"value":10.50},"regular_price":{"value":12.00}}}}}}"""))

    // batch b (0..2) = ids [b*B, (b+1)*B)
    def rawFrontier(batch: Int): DataFrame =
      spark.range(batch * B, (batch + 1) * B)
        .select(lit(s"cat$batch").as("category"), url(col("id")).as("url"),
          lit(false).as("is_processed"), col("id").as("discovered_seq"))

    // pages parquet for the whole universe, written once (the constant "web")
    val pagesPath = s"/tmp/graft_recrawl_pages_$B"
    if (!new java.io.File(s"$pagesPath/_SUCCESS").exists()) {
      Seq(false, true).map { ar =>
        spark.range(0, 3 * B).select(
          url(col("id")).as("url"),
          (lit(1700000000000L) + col("id")).cast("timestamp").as("warc_ts"),
          encode(doc(ar), "UTF-8").as("html"),
          lit("").as("text"),
          lit(if (ar) "ar" else "en").as("lang"))
      }.reduce(_ unionByName _).write.mode("overwrite").parquet(pagesPath)
    }
    val pages = spark.read.parquet(pagesPath)
    val robots = Seq.empty[(String, String, Boolean, Int)]
      .toDF("host", "path_prefix", "allow", "crawl_delay_ms")
    val budgets = Seq.empty[(String, Int)].toDF("host", "per_round")
    val brandDim = graft.extract.GraphQLExtract.spinneysBrandDim(
      Seq(("Brand 0", "https://img/b0.png", 0L)).toDF("name", "image_url", "fetch_seq"))

    val dir = java.nio.file.Files.createTempDirectory("graft-recrawl-probe").toString
    val engine = new graft.app.CrawlEngine(spark, dir, numPartitions = 16,
      defaultBudget = Int.MaxValue / 2, maxAttempts = 2,
      merchant = graft.app.MerchantSpec.spinneys(brandDim),
      recrawlAfterRounds = Some(w))
    engine.init(engine.enrichSeeds(rawFrontier(0)))

    (1 to rounds).foreach { r =>
      if (r > 1) // rounds 2,3: fresh batches; round >= 4: the expired batch
        engine.ingestFrontierAppend(engine.enrichSeeds(rawFrontier((r - 1) % 3)))
      val seenRows = engine.seenTable.currentSnapshot.map(_.rowCount).getOrElse(0L)
      Thread.sleep(300); val b0 = shufBytes.get()
      val t0 = System.nanoTime()
      val scheduled = engine.runRound(pages, robots, budgets)
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300); val shuf = shufBytes.get() - b0
      println(f"RESULT round=$r scheduled=$scheduled seen_rows_before=$seenRows " +
        f"wall=$wall%.1fs shuffle=${shuf / 1048576.0}%.1fMiB")
      assert(scheduled == B, s"round $r: scheduled $scheduled != $B")
    }
    val sk = engine.sketchTable.currentSnapshot.get
    println(s"RESULT sketch: lineage=${sk.lineageJson} rows=${sk.rowCount}")
    spark.stop()
  }
}
