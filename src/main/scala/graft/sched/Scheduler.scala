package graft.sched

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.politeness.Politeness

/** The frontier drain (SURVEY.md §2.7 O1, §7 module 5).
  *
  * The reference drains its frontier strictly in file order on one thread
  * (carrefour_extract_data.py:216). A parallel engine must reproduce that
  * determinism while actually being parallel, so the crawl order is a pure
  * function of the data — the priority key (host_rank, depth,
  * discovered_seq, url_hash) — never of task timing. Verified invariant
  * across local[N] in SchedulerSpec.
  *
  * Scale design:
  *  - global numbering uses repartitionByRange + sortWithinPartitions +
  *    per-partition offsets (two light jobs, no single-reducer window, no
  *    RDD API) — each partition numbers its own sorted range independently;
  *  - the fetch stage repartitions by SALTED host hash
  *    (xxhash64(host, salt) % P) so one hot host (the synthetic corpus gives
  *    host0 ~50% of URLs) spreads over `saltFactor` partitions instead of
  *    pinning one executor, while per-host budgets keep politeness intact.
  */
object Scheduler {

  /** Deterministic priority key, worst-first = never; lowest sorts first. */
  val priorityColNames: Seq[String] = Seq("host_rank", "depth", "discovered_seq", "url_hash")

  /** Assign a contiguous, parallelism-invariant global `crawl_order` by the
    * given sort columns. Two jobs: (1) count rows per range partition,
    * (2) number rows within each sorted range offset by the cumulative
    * counts. Requires the sort key to be a total order (url_hash tiebreak
    * guarantees it).
    *
    * The range-partition id is MATERIALIZED into the cached rows (`__pid`)
    * rather than read from TaskContext at numbering time: a downstream
    * `coalesce` (e.g. before a single-file write) merges several range
    * partitions into one task, where TaskContext.getPartitionId would lie;
    * the per-parent-partition mapPartitions invocation still sees one
    * consistent `__pid` per iterator, so the offsets stay correct under any
    * physical re-packing. */
  def withCrawlOrder(df: DataFrame, sortCols: Seq[Column], numPartitions: Int): DataFrame = {
    val ranged = df
      .repartitionByRange(numPartitions, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .persist() // materialized by the counts job below, with correct pids
    val counts: Array[(Int, Long)] = ranged
      .groupBy(col("__pid")).count()
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val offsets: Map[Int, Long] = {
      val sorted = counts.sortBy(_._1)
      var acc = 0L
      sorted.map { case (pid, c) => val off = acc; acc += c; pid -> off }.toMap
    }
    val spark = df.sparkSession
    val offsetsBc = spark.sparkContext.broadcast(offsets)
    val pidIdx = ranged.schema.fieldIndex("__pid")
    val outSchema = org.apache.spark.sql.types.StructType(
      ranged.schema.fields.filterNot(_.name == "__pid"))
      .add("crawl_order", LongType, nullable = false)
    ranged.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val buf = it.buffered
        var i = offsetsBc.value.getOrElse(buf.head.getInt(pidIdx), 0L)
        buf.map { row =>
          val vals = row.toSeq
          val out = Row.fromSeq(vals.patch(pidIdx, Nil, 1) :+ i)
          i += 1
          out
        }
      }
    }(Encoders.row(outSchema))
  }

  /** One scheduling round: robots filter -> per-host budget -> global crawl
    * order over the rows scheduled this round. Deferred rows (over budget)
    * are returned too, flagged `scheduled_now = false`, so the round driver
    * re-enqueues them.
    *
    * Input must carry url_norm, url_hash, host, depth, host_rank,
    * discovered_seq columns (FrontierEntry shape). */
  def schedule(
      frontier: DataFrame,
      robots: DataFrame,
      budgets: DataFrame,
      defaultBudget: Int,
      numPartitions: Int): (DataFrame, DataFrame) = {
    val allowed = Politeness.applyRobots(frontier, robots)
    // persisted: the scheduled-now and deferred branches both read this
    val budgeted = Politeness.applyBudgets(allowed, budgets, defaultBudget).persist()
    val now = budgeted.filter(col("scheduled_now")).drop("scheduled_now")
    val deferred = budgeted.filter(!col("scheduled_now")).drop("scheduled_now")
    val ordered = withCrawlOrder(
      now,
      Seq(col("host_rank"), col("depth"), col("discovered_seq"), col("url_hash")),
      numPartitions)
    (ordered, deferred)
  }

  /** Full scheduling round with NARROW shuffles: robots filtering runs on
    * the wide rows first (broadcast rules + expression fold — shuffle-free),
    * then dedup, the seen gate, the budget windows and the range-partitioned
    * global ordering all shuffle only
    * (url_hash, host, depth, host_rank, discovered_seq, attempt) — the long
    * url/url_norm/category strings cross the wire exactly once, in the final
    * rejoin keyed by the unique (url_hash, discovered_seq). Cuts per-round
    * shuffle bytes several-fold versus shuffling wide rows through all four
    * exchanges; identical output (CrawlEngineSpec oracle + SchedulerSpec).
    * Returns (scheduled-with-crawl_order, deferred), both wide. */
  def scheduleRoundNarrow(
      pending: DataFrame,
      robots: DataFrame,
      budgets: DataFrame,
      seen: DataFrame,
      expectedSeen: Long,
      bloomFpp: Double,
      defaultBudget: Int,
      numPartitions: Int): (DataFrame, DataFrame) = {
    import graft.seen.UrlSeen
    import org.apache.spark.sql.expressions.Window
    val allowed = Politeness.applyRobots(pending, robots)
    val narrowCols = Seq("url_hash", "host", "depth", "host_rank", "discovered_seq", "attempt")
    val joinKeys = Seq("url_hash", "discovered_seq")
    // persisted: both the narrow pipeline and the string side scan `allowed`
    val allowedP = allowed.persist()
    val strings = allowedP.drop(narrowCols.filterNot(joinKeys.contains): _*)
    val narrow = allowedP.select(narrowCols.map(col): _*)
    val dedupW = Window.partitionBy(col("url_hash")).orderBy(col("discovered_seq"))
    val deduped = narrow
      .withColumn("__rn", row_number().over(dedupW)).filter(col("__rn") === 1).drop("__rn")
    val unseen = UrlSeen.antiJoin(deduped, seen, "url_hash", expectedSeen, bloomFpp)
    val budgeted = Politeness.applyBudgets(unseen, budgets, defaultBudget).persist()
    val now = budgeted.filter(col("scheduled_now")).drop("scheduled_now")
    val deferred = budgeted.filter(!col("scheduled_now")).drop("scheduled_now")
    val ordered = withCrawlOrder(
      now, priorityColNames.map(col), numPartitions)
    (ordered.join(strings, joinKeys), deferred.join(strings, joinKeys))
  }

  /** Salted repartition-by-host for the fetch/extract stage: a host's rows
    * land on `saltFactor` partitions (not 1, not all), bounding both skew
    * and the number of concurrent workers per host. */
  def saltedByHost(df: DataFrame, numPartitions: Int, saltFactor: Int): DataFrame = {
    val salt = pmod(col("url_hash"), lit(saltFactor))
    df.repartition(numPartitions, col("host"), salt)
      .sortWithinPartitions(priorityColNames.map(col): _*)
  }
}
