package graft.politeness

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Politeness layer (SURVEY.md §2.7 O2/O3).
  *
  * The reference is polite by construction: one thread, `time.sleep(1)` per
  * page (metro_markets_extract_product_urls.py:91), robots obedience
  * (bookscraper/bookscraper/settings.py:20). In a parallel engine the same
  * guarantees become data rules:
  *
  *  - robots: a broadcast-joined rules table (host, path_prefix, allow);
  *    longest matching prefix wins; unmatched hosts default-allow.
  *  - per-host budget: at most `per_round` URLs of one host are schedulable
  *    per round; ranking within a host is the deterministic priority key, so
  *    the SAME urls are chosen at any parallelism.
  */
object Politeness {

  /** Priority ordering within a host: host_rank, depth, oldest-first
    * discovery, url_hash tiebreak — a pure function of the data
    * (SURVEY.md §7 hard-part 2). */
  def priorityCols(df: DataFrame): Seq[Column] =
    Seq(df("host_rank"), df("depth"), df("discovered_seq"), df("url_hash"))

  /** Apply robots rules: keep rows whose (host, path) resolves to allow.
    * Rules are a small dimension -> broadcast; longest-prefix-wins via
    * row_number over prefix length. */
  def applyRobots(frontier: DataFrame, robots: DataFrame): DataFrame = {
    val path = regexp_replace(frontier("url_norm"), "^[a-z][a-z0-9+.-]*://[^/?]*", "")
    val f = frontier.withColumn("__path", path)
    val joined = f.join(
      broadcast(robots.select(col("host"), col("path_prefix"), col("allow"))),
      f("host") === robots("host") && f("__path").startsWith(robots("path_prefix")),
      "left_outer")
      .drop(robots("host"))
    val w = Window
      .partitionBy(col("url_hash"), col("discovered_seq"))
      .orderBy(length(coalesce(col("path_prefix"), lit(""))).desc)
    joined
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .filter(coalesce(col("allow"), lit(true))) // no rule -> allow
      .drop("__path", "__rn", "path_prefix", "allow")
  }

  /** Per-host budget: rows ranked within host by the priority key; rank <=
    * budget are schedulable this round, the rest are deferred. Returns the
    * frontier with a boolean `scheduled_now`. Hosts without a budget row get
    * `defaultBudget`. */
  def applyBudgets(frontier: DataFrame, budgets: DataFrame, defaultBudget: Int): DataFrame = {
    val w = Window.partitionBy(col("host"))
      .orderBy(col("host_rank"), col("depth"), col("discovered_seq"), col("url_hash"))
    frontier
      .join(broadcast(budgets), Seq("host"), "left_outer")
      .withColumn("__host_rn", row_number().over(w))
      .withColumn("scheduled_now",
        col("__host_rn") <= coalesce(col("per_round"), lit(defaultBudget)))
      .drop("__host_rn", "per_round")
  }
}
