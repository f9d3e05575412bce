package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{BooleanType, LongType, StringType, StructType}

import graft.app.CrawlEngine

/** Incremental frontier ingest as Structured Streaming (SURVEY.md §2.9: the
  * engine's core is batch rounds with checkpointed state — the streaming
  * layer feeds those rounds incrementally rather than replacing them).
  *
  * New frontier files (the reference's "new frontier CSV per discovery run",
  * e.g. extracted_urls_2024-11-10.csv) land in a directory; `readStream`
  * discovers them, each micro-batch is canonicalized/enriched and appended
  * to the engine's frontier SnapshotTable, and the engine then drains rounds
  * as usual. `Trigger.AvailableNow` processes the backlog and stops —
  * kill/resume safety comes from the streaming checkpoint (file-source
  * offsets) + the engine's own snapshot commits, so a crashed ingest neither
  * loses nor duplicates frontier files.
  */
object FrontierStream {

  /** Parquet frontier-entry stream schema (category,url,is_processed,
    * discovered_seq as produced by FrontierSources/generators). */
  val rawSchema: StructType = new StructType()
    .add("category", StringType)
    .add("url", StringType)
    .add("is_processed", BooleanType)
    .add("discovered_seq", LongType)

  /** Ingest all currently-available frontier files from `inDir` into the
    * engine's frontier table (enriched + appended once per micro-batch),
    * then return. `checkpointDir` dedups files across restarts. */
  def ingestAvailable(
      spark: SparkSession,
      engine: CrawlEngine,
      inDir: String,
      checkpointDir: String): Unit = {
    val stream = spark.readStream
      .schema(rawSchema)
      .parquet(inDir)
    val query = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val enriched = engine.enrichSeeds(batch)
          val pending = enriched.filter(!col("is_processed"))
          val preSeen = enriched.filter(col("is_processed")).select(col("url_hash"))
          // append new pending entries + new pre-seen hashes; the next
          // engine round dedups + seen-gates them exactly like any other
          // frontier content. The engine helpers parent from the resume-
          // resolved base so an append racing a torn round commit is never
          // chained onto the orphaned snapshot (ADVICE r02).
          engine.ingestFrontierAppend(pending)
          if (!preSeen.isEmpty) engine.ingestSeenAppend(preSeen)
          ()
        }
      }
      .start()
    query.awaitTermination()
  }
}
