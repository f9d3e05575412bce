package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming fetch telemetry (SURVEY.md §2.9 / the brief's Structured
  * Streaming surface beyond ingest): the reference is polite by blocking
  * sleeps on one thread; a parallel crawler instead OBSERVES its fetch
  * stream and enforces/flags politeness as data.
  *
  *  - [[hostWindowCounts]]: event-time windowed per-host fetch rates with a
  *    watermark — the standard windowed-agg + late-data-drop shape; feeds
  *    budget adaptation (hosts trending over budget get smaller quotas next
  *    round).
  *  - [[politenessViolations]]: per-host custom state via
  *    flatMapGroupsWithState — remembers each host's last fetch time across
  *    micro-batches and emits a violation row whenever two fetches land
  *    closer than the host's crawl delay (metro_markets_extract_product_
  *    urls.py:91's 1 s/page contract, checked instead of slept).
  */
object FetchRateStream {

  final case class FetchEvent(host: String, ts: Timestamp, url_hash: Long)
  final case class HostState(lastTsMs: Long)
  final case class Violation(host: String, ts: Timestamp, gap_ms: Long)

  /** Tumbling event-time windows per host; events later than the watermark
    * are dropped (never counted twice, never counted late). Append-mode
    * emits a window only once it is finalized. */
  def hostWindowCounts(
      events: DataFrame,
      windowDur: String = "1 minute",
      watermark: String = "2 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur), col("host"))
      .agg(count(lit(1)).as("fetches"))
      .select(col("window.start").as("window_start"), col("host"), col("fetches"))

  /** Per-host stateful monitor: consecutive fetches closer than minDelayMs
    * are violations. State = the host's last fetch timestamp, carried across
    * micro-batches; within a batch events are processed in event-time order
    * (deterministic under any shuffle arrival order). */
  def politenessViolations(
      events: Dataset[FetchEvent],
      minDelayMs: Long): Dataset[Violation] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.host)
      .flatMapGroupsWithState[HostState, Violation](
        OutputMode.Update, GroupStateTimeout.NoTimeout) { (host, it, state) =>
        val sorted = it.toIndexedSeq.sortBy(_.ts.getTime)
        var last = state.getOption.map(_.lastTsMs).getOrElse(Long.MinValue)
        val out = IndexedSeq.newBuilder[Violation]
        sorted.foreach { e =>
          val t = e.ts.getTime
          if (last != Long.MinValue && t - last < minDelayMs)
            out += Violation(host, e.ts, t - last)
          last = math.max(last, t)
        }
        if (sorted.nonEmpty) state.update(HostState(last))
        out.result().iterator
      }
  }
}
