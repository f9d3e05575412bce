package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.FetchRateStream
import graft.streaming.FetchRateStream.FetchEvent

class FetchRateStreamSpec extends SparkTestBase {

  private val Base = 1700000040000L // minute-aligned (epoch-aligned tumbling windows)
  private def ts(sec: Long): Timestamp = new Timestamp(Base + sec * 1000)

  test("windowed host rates: event-time windows, watermark drops late data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[FetchEvent]
    val counts = FetchRateStream.hostWindowCounts(
      source.toDF(), windowDur = "1 minute", watermark = "1 minute")
    val query = counts.writeStream
      .format("memory").queryName("host_rates").outputMode("append").start()
    try {
      // window [0,60): a=3, b=1; window [60,120): a=1
      source.addData(
        FetchEvent("a", ts(1), 1), FetchEvent("a", ts(20), 2), FetchEvent("a", ts(50), 3),
        FetchEvent("b", ts(30), 4), FetchEvent("a", ts(70), 5))
      query.processAllAvailable()
      // advance the watermark far past both windows so they finalize
      source.addData(FetchEvent("c", ts(600), 6))
      query.processAllAvailable()
      // a late event for window [0,60) — beyond the watermark, must be dropped
      source.addData(FetchEvent("a", ts(5), 7))
      query.processAllAvailable()
      source.addData(FetchEvent("c", ts(1200), 8))
      query.processAllAvailable()
      val rows = spark.table("host_rates")
        .collect().map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2))).toSet
      val w0 = Base
      assert(rows.contains((w0, "a", 3L)), s"window0 a: $rows")
      assert(rows.contains((w0, "b", 1L)))
      assert(rows.contains((w0 + 60000, "a", 1L)))
      // the late event must NOT have produced a second [0,60) row for a
      assert(rows.count(r => r._1 == w0 && r._2 == "a") == 1)
    } finally query.stop()
  }

  test("politeness violations: per-host state survives micro-batches, gaps flagged") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[FetchEvent]
    val violations = FetchRateStream.politenessViolations(source.toDS(), minDelayMs = 1000)
    val query = violations.writeStream
      .format("memory").queryName("violations").outputMode("update").start()
    try {
      // batch 1: host a at t=0s and t=0.4s (violation, gap 400); b at 0 and 2s (ok)
      source.addData(
        FetchEvent("a", new Timestamp(1700000000000L), 1),
        FetchEvent("a", new Timestamp(1700000000400L), 2),
        FetchEvent("b", new Timestamp(1700000000000L), 3),
        FetchEvent("b", new Timestamp(1700000002000L), 4))
      query.processAllAvailable()
      // batch 2: host a again at +0.7s after its batch-1 last (cross-batch state)
      source.addData(FetchEvent("a", new Timestamp(1700000001100L), 5))
      query.processAllAvailable()
      val got = spark.table("violations")
        .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2))).toSet
      assert(got == Set(
        ("a", 1700000000400L, 400L),   // within batch 1
        ("a", 1700000001100L, 700L)))  // across batches: 1100 - 400
    } finally query.stop()
  }
}
