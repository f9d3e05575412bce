package graft.seen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** URL-seen gate (SURVEY.md §2.4 J4 / §2.5 A2).
  *
  * The reference keeps a Python set / rewrites a CSV per URL
  * (scripts/utils/helpers.py:120-176). At 10^10-frontier design scale the
  * seen set cannot be a broadcast hash set, so the gate is two-stage:
  *
  *  1. Bloom pre-filter — a space-bounded sketch of the seen url_hash column
  *     (built distributed via Spark's `stat.bloomFilter`, which merges
  *     partition-local sketches on the driver). Rows the Bloom rejects are
  *     DEFINITELY unseen (no false negatives) and skip the join entirely.
  *  2. Exact left-anti join on url_hash for Bloom-positives only — removes
  *     the Bloom's false positives. At fpp=3% only ~3% of truly-new URLs pay
  *     the shuffle; seen URLs are filtered without error.
  *
  * Correctness identity: result == frontier LEFT ANTI JOIN seen, always.
  */
object UrlSeen {

  /** Build a Bloom sketch over `seen(hashCol)`. `expected` must be >= the
    * seen cardinality for the fpp bound to hold. */
  def bloomOf(seen: DataFrame, hashCol: String, expected: Long, fpp: Double = 0.03): BloomFilter =
    seen.stat.bloomFilter(hashCol, math.max(expected, 1L), fpp)

  /** frontier rows whose hashCol is NOT in seen. Two-stage: Bloom prefilter,
    * then exact anti-join on the (few) Bloom positives, then union. */
  def antiJoin(
      frontier: DataFrame,
      seen: DataFrame,
      hashCol: String,
      expectedSeen: Long,
      fpp: Double = 0.03): DataFrame = {
    if (seen.isEmpty) return frontier
    val spark = frontier.sparkSession
    val bloom = bloomOf(seen, hashCol, expectedSeen, fpp)
    val bloomBc = spark.sparkContext.broadcast(bloom)
    val mightBeSeen = udf((h: Long) => bloomBc.value.mightContainLong(h))
    // persisted: the definitely-new and candidate branches both read the
    // frontier — without this its upstream plan executes twice per round
    val input = frontier.persist()
    val definitelyNew = input.filter(!mightBeSeen(col(hashCol)))
    val candidates = input.filter(mightBeSeen(col(hashCol)))
    val survivors = candidates.join(
      seen.select(col(hashCol)).distinct(), Seq(hashCol), "left_anti")
    definitelyNew.unionByName(survivors)
    // (callers release the persist via round-end spark.catalog.clearCache())
  }

  /** Plain exact anti-join (the correctness identity; used at tiny scale and
    * as the test oracle for the Bloom path). */
  def exactAntiJoin(frontier: DataFrame, seen: DataFrame, hashCol: String): DataFrame =
    frontier.join(seen.select(col(hashCol)).distinct(), Seq(hashCol), "left_anti")
}
