package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** IVF centroid-seeding balance probe (VERDICT r02 #4): on a corpus whose
  * embeddings are SKEWED along the id axis (ids correlate with position —
  * the regime where "first k by id" collapses), compare cluster-population
  * balance of:
  *   (a) first-k-by-id centroids (the round-2 rule);
  *   (b) md5-rank spread sample (the round-3 rule, exactly what
  *       q_ann_ivf_assign/q_embed_neardup now use).
  * Prints max/mean cluster population for both; the md5-rank rule should
  * keep max/mean small (≤ ~3) where first-k degrades.
  */
object DebugIvfBalance {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(40000L)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // skewed synthetic corpus: embedding = position drift along id order +
    // small noise, so low ids cluster in one corner of the space (ids
    // correlate with embedding position — exactly the first-k failure mode)
    val dim = 8
    val emb = spark.range(0, n, 1, 16).map { id =>
      val drift = id.toDouble / n
      val v = Array.tabulate(dim) { d =>
        val noise = ((graft.gen.Synthetic.mix2(id, d) % 1000) / 10000.0)
        (drift * (d + 1) / dim + noise).toFloat
      }
      (id, v)
    }.toDF("vec_id", "embedding")
    emb.persist().count()

    val k = math.max(1L, math.ceil(math.sqrt(n.toDouble)).toLong)
    def q(c: org.apache.spark.sql.Column) =
      transform(c, x => floor(x.cast("double") * 1000).cast("long"))
    val qemb = emb.select(col("vec_id"), q(col("embedding")).as("qv"))

    def balance(tag: String, centIds: org.apache.spark.sql.DataFrame): Unit = {
      val cents = qemb.join(broadcast(centIds), Seq("vec_id"))
        .select(col("vec_id").as("cid"), col("qv").as("cq"))
      val dists = qemb.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("cid"),
          graft.plans.VecExprs.l2sq(col("qv"), col("cq")).as("d2"))
      val w = Window.partitionBy(col("vec_id")).orderBy(col("d2"), col("cid"))
      val assign = dists.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      val pops = assign.groupBy("cid").count()
      val row = pops.agg(max("count").as("mx"), avg("count").as("mean"),
        count(lit(1)).as("nonempty")).head
      val mx = row.getLong(0); val mean = row.getDouble(1)
      println(f"RESULT $tag: k=$k clusters_nonempty=${row.getLong(2)} " +
        f"max_pop=$mx mean_pop=$mean%.1f max_over_mean=${mx / mean}%.2f")
    }

    balance("first_k ", emb.select("vec_id").filter(col("vec_id") < k))
    balance("md5_rank", emb.select("vec_id")
      .orderBy(md5(col("vec_id").cast("string").cast("binary")), col("vec_id"))
      .limit(k.toInt))
    spark.stop()
  }
}
