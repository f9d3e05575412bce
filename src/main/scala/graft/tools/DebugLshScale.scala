package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hyperplane-LSH bucket-space scaling probe (VERDICT r03 #2): at n >> 2^P
  * buckets, a FIXED plane count makes essentially every bucket bust the
  * per-bucket cap — candidate recall silently collapses and the expected
  * pair work is O(n²/2^P), quadratic. The round-4 rule grows P with the
  * corpus (GraftQueries.annPlaneCount: smallest P with targetBucket*2^P>=n)
  * so expected bucket population stays ~constant.
  *
  * For a corpus of >=1M synthetic vectors this prints, for BOTH rules:
  *   - number of occupied buckets
  *   - fraction of vectors dropped by the cap (in buckets with >cap members)
  *   - within-bucket candidate-pair count, and its ratio to n (the per-item
  *     work — must stay O(1)-ish for the scaled rule) and to n²/2.
  *
  * Usage: runMain graft.tools.DebugLshScale [n] [dim]
  */
object DebugLshScale {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val dim = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // near-dup corpus shape: MANY SMALL dup-clusters (~16 members — the
    // near-dup regime: most docs have a handful of close variants), cluster
    // count grows with n. A corpus of a few mega-clusters is not an LSH
    // failure mode — ANY locality-sensitive scheme must co-bucket a tight
    // 100k-member cluster, and the cap correctly drops it (exact dedup
    // upstream removes those first).
    val nClusters = math.max(64L, n / 16)
    val emb = spark.range(0, n, 1, 64).map { id =>
      val cluster = (graft.gen.Synthetic.mix2(id, 3) % nClusters + nClusters) % nClusters
      def u(h: Long, m: Long): Double = (((h % m) + m) % m).toDouble // [0, m)
      val v = Array.tabulate(dim) { d =>
        val center = u(graft.gen.Synthetic.mix2(cluster, d + 100), 2000) / 1000.0 - 1.0
        val noise = u(graft.gen.Synthetic.mix2(id, d), 400) / 1000.0 - 0.2
        (center + noise).toFloat
      }
      (id, v)
    }.toDF("vec_id", "embedding")

    def quant(c: Column): Column =
      transform(c, x => floor(x.cast("double") * 1000).cast("long"))
    val qemb = emb.select(col("vec_id"), quant(col("embedding")).as("q"))
    qemb.persist().count()

    def probe(tag: String, planeCount: Int, cap: Long): Unit = {
      val planes = graft.queries.GraftQueries.annPlanesFor(planeCount, dim)
      val withBits = planes.zipWithIndex.foldLeft(qemb) { case (df, (p, j)) =>
        df.withColumn(s"__b$j",
          when(graft.plans.VecExprs.dot(col("q"), typedlit(p)) >= 0, lit(1L << j))
            .otherwise(lit(0L)))
      }
      val buckets = withBits
        .withColumn("bucket", planes.indices.map(j => col(s"__b$j")).reduce(_ + _))
        .groupBy("bucket").count()
      val row = buckets.agg(
        count(lit(1)).as("occupied"),
        sum(when(col("count") > cap, col("count")).otherwise(0L)).as("dropped"),
        sum(when(col("count") <= cap, (col("count") * (col("count") - 1) / 2).cast("long"))
          .otherwise(0L)).as("pairs"),
        max(col("count")).as("max_pop")).head
      val occupied = row.getLong(0); val dropped = row.getLong(1)
      val pairs = row.getLong(2); val maxPop = row.getLong(3)
      println(f"RESULT $tag: n=$n planes=$planeCount buckets_occupied=$occupied " +
        f"max_pop=$maxPop dropped_frac=${dropped.toDouble / n}%.4f " +
        f"pairs=$pairs pairs_per_item=${pairs.toDouble / n}%.1f " +
        f"pairs_over_n2half=${2.0 * pairs / (n.toDouble * (n - 1))}%.2e")
    }

    probe("fixed8_r03", 8, 64)
    probe("scaled_r04", graft.queries.GraftQueries.annPlaneCount(n), 64)
    // cap sensitivity: the residual drops at cap=64 are multi-cluster bucket
    // collisions (expected pop ~AnnTargetBucket); doubling the cap shows how
    // much of the drop is cap-tightness vs genuinely hot buckets
    probe("scaled_r04_cap128", graft.queries.GraftQueries.annPlaneCount(n), 128)
    spark.stop()
  }
}
