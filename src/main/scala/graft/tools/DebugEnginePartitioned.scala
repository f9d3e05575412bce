package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** VERDICT r04 #3 scale half: the partitioned Bloom seen gate LIVE through
  * real engine rounds at a seen cardinality ABOVE UrlSeen.PartitionedThreshold
  * (8M) — no force flag, the manifest rowCount drives the dispatch — with a
  * kill between table commits and an exact resume.
  *
  * Shape: 9M-entry seen table (url hashes of ids 0..9M), a 300k frontier
  * window straddling the seen boundary (ids 8.85M..9.15M → half its urls are
  * already seen), pages for a slice of the unseen ids. Run A: 2 clean
  * rounds. Run B: round 1 clean, round 2 torn after the seen append
  * (crashAfterCommit=2), resumed on a fresh engine. Asserts:
  *   - the partitioned path was actually taken (seen rowCount > threshold);
  *   - schedule tables of A and B are IDENTICAL (order included);
  *   - final seen sets are IDENTICAL and equal seed-seen ∪ fetched;
  *   - the scheduled set equals the exact anti-join oracle (identity check
  *     of the Bloom+cogroup build at 9M, same as UrlSeenSpec at toy size).
  *
  * Usage: runMain graft.tools.DebugEnginePartitioned [seenN] [frontierN]
  */
object DebugEnginePartitioned {
  def main(args: Array[String]): Unit = {
    val seenN = args.headOption.map(_.toLong).getOrElse(9000000L)
    val windowN = args.lift(1).map(_.toLong).getOrElse(300000L)
    require(seenN > graft.seen.UrlSeen.PartitionedThreshold,
      s"probe is about the >${graft.seen.UrlSeen.PartitionedThreshold} dispatch")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.app.CrawlEngine
    import graft.gen.Synthetic

    val t0 = System.nanoTime()
    // 9M seen hashes = the engine's own canon+hash of the EN urls of ids
    // 0..seenN (exactly what earlier crawl rounds would have committed)
    val seenDf = spark.range(0, seenN, 1, 64)
      .mapPartitions { it =>
        it.map { id => graft.util.Hashing.xxhash64(
          graft.url.UrlCanon.canonicalize(Synthetic.url(id, "en"))) }
      }(org.apache.spark.sql.Encoders.scalaLong)
      .toDF("url_hash")

    // frontier window straddling the seen boundary
    val lo = seenN - windowN / 2
    val hi = seenN + windowN / 2
    import spark.implicits._
    val frontier = spark.range(lo, hi, 1, 32).map { id =>
      (Synthetic.category(id), Synthetic.url(id, "en"), false, id)
    }.toDF("category", "url", "is_processed", "discovered_seq")

    // pages for the first half of the unseen slice -> round-2 retries exist
    val pages = Synthetic.pages(spark, 2000, 8).toDF() // small decoy corpus
    val robots = Synthetic.robots(spark).toDF()
    val budgets = Synthetic.budgets(spark, Int.MaxValue).toDF()

    def drive(tear: Boolean): CrawlEngine = {
      val dir = Files.createTempDirectory("graft-part-bloom").toString
      val e = new CrawlEngine(spark, dir, numPartitions = 32,
        defaultBudget = Int.MaxValue, maxAttempts = 2)
      e.init(e.enrichSeeds(frontier))
      e.ingestSeenAppend(seenDf)
      e.runRound(pages, robots, budgets)
      if (tear) {
        e.crashAfterCommit = 2
        try { e.runRound(pages, robots, budgets); sys.error("no crash?") }
        catch { case _: RuntimeException => () }
        e.crashAfterCommit = -1
        val e2 = new CrawlEngine(spark, dir, numPartitions = 32,
          defaultBudget = Int.MaxValue, maxAttempts = 2)
        e2.runRound(pages, robots, budgets)
        e2
      } else { e.runRound(pages, robots, budgets); e }
    }

    val a = drive(tear = false)
    println(f"[probe] clean 2-round run done at ${(System.nanoTime() - t0) / 1e9}%.0fs")
    val b = drive(tear = true)
    println(f"[probe] torn+resumed run done at ${(System.nanoTime() - t0) / 1e9}%.0fs")

    // the dispatch really was partitioned: rowCount from the manifest
    val seenCount = a.seenTable.read().get.count()
    require(seenCount > graft.seen.UrlSeen.PartitionedThreshold,
      s"seen $seenCount did not exceed the partitioned threshold")

    def sched(e: CrawlEngine) = e.scheduleTable.read().get
      .select("round", "crawl_order", "url_norm")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2))).sorted.toSeq
    val sa = sched(a); val sb = sched(b)
    require(sa == sb, s"torn-resume schedule diverged: ${sa.size} vs ${sb.size}")

    val seenA = a.seenTable.read().get.as[Long].collect().toSet
    val seenB = b.seenTable.read().get.as[Long].collect().toSet
    require(seenA == seenB, "torn-resume seen set diverged")

    // identity oracle: round-1 scheduled set == exact anti-join of the
    // deduped pending frontier against the 9M seed-seen
    val pendingHashes = spark.range(lo, hi, 1, 32).map { id =>
      graft.util.Hashing.xxhash64(graft.url.UrlCanon.canonicalize(Synthetic.url(id, "en")))
    }.toDF("url_hash")
    val expect = pendingHashes.join(seenDf, Seq("url_hash"), "left_anti")
      .distinct().count()
    val round1 = a.scheduleTable.read().get.filter(col("round") === 1).count()
    require(round1 == expect,
      s"round-1 scheduled $round1 != exact anti-join oracle $expect")

    println(f"RESULT partitioned_engine_probe seen=$seenCount window=$windowN " +
      f"round1_scheduled=$round1 oracle=$expect torn_resume=exact " +
      f"wall=${(System.nanoTime() - t0) / 1e9}%.0fs")
    spark.stop()
  }
}
