package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

class TextFunctionsSpec extends SparkTestBase {

  test("simhash64: similar docs closer than dissimilar (hamming)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again tonight"),
      (3L, "completely different words about spark shuffles partitions and codegen")
    ).toDF("id", "text")
    val fp = docs.select(col("id"), simhash64(wsTokens(col("text"))).as("f"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fp(1L), fp(2L)) < ham(fp(1L), fp(3L)))
    assert(ham(fp(1L), fp(2L)) < ham(fp(2L), fp(3L)))
  }

  test("simhash64 deterministic and identical for identical text") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e"), (2L, "a b c d e")).toDF("id", "text")
    val fps = docs.select(simhash64(wsTokens(col("text")))).collect().map(_.getLong(0))
    assert(fps(0) == fps(1))
  }

  test("hamming64 via bit_count") {
    import spark.implicits._
    val df = Seq((0xFFL, 0x0FL)).toDF("a", "b")
    assert(df.select(hamming64(col("a"), col("b"))).head.getInt(0) == 4)
  }

  test("shingles: sliding k-grams, short arrays empty") {
    import spark.implicits._
    val df = Seq((1L, "a b c d"), (2L, "a b")).toDF("id", "text")
    val got = df.select(col("id"), shingles(wsTokens(col("text")), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L) == Seq("a b c", "b c d"))
    assert(got(2L).isEmpty)
  }

  test("minhash: identical shingle sets give identical signatures; containment raises agreement") {
    import spark.implicits._
    val df = Seq(
      (1L, "w x y z a b c d e f"),
      (2L, "w x y z a b c d e f"),
      (3L, "p q r s t u v k l m")
    ).toDF("id", "text")
    val sigs = df.select(col("id"), minhash(shingles(wsTokens(col("text")), 3), 16).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(2L))
    val agree13 = sigs(1L).zip(sigs(3L)).count { case (a, b) => a == b }
    assert(agree13 < 16)
  }

  test("NATIVE simhash64 expression identical to the Column-algebra formulation") {
    import spark.implicits._
    val docs = graft.gen.Synthetic
    val df = (0L until 120L).map(id => (id, s"doc $id " + (0 to (id % 17).toInt)
      .map(i => s"w${docs.mix2(id, i.toLong) % 23}").mkString(" "))).toDF("id", "text")
    val both = df.select(col("id"),
        simhash64(wsTokens(col("text"))).as("colv"),
        graft.plans.SimHash64Expr.simhash64Native(wsTokens(col("text"))).as("natv"))
      .collect()
    both.foreach(r => assert(r.getLong(1) == r.getLong(2), s"id=${r.getLong(0)}"))
  }

  test("NATIVE fused shingle+minhash == native minhash over materialized shingles") {
    import spark.implicits._
    val df = Seq(
      (1L, "w x y z a b c d e f"), (2L, "w x y z a b c d e f"),
      (3L, "p q r s t u v k l m"), (4L, "a b")).toDF("id", "text")
    val both = df.select(col("id"),
        graft.plans.MinHashShingledExpr.minhashShingled(wsTokens(col("text")), 16, 3).as("fused"),
        graft.plans.MinHashExpr.minhashNative(shingles(wsTokens(col("text")), 3), 16).as("staged"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getSeq[Long](2)))
    both.foreach { case (id, a, b) => assert(a == b, s"id=$id") }
    // identical docs -> identical signatures; disjoint docs disagree
    val m = both.map(t => t._1 -> t._2).toMap
    assert(m(1L) == m(2L))
    assert(m(1L).zip(m(3L)).count { case (a, b) => a == b } < 16)
    // shorter than the shingle width -> all-sentinel signature (no windows)
    assert(m(4L).forall(_ == Long.MaxValue))
  }

  test("lshBands: identical signatures share all bands") {
    import spark.implicits._
    val df = Seq((1L, "a b c d e f g h"), (2L, "a b c d e f g h")).toDF("id", "text")
    val bands = df.select(col("id"),
      explode(lshBands(minhash(shingles(wsTokens(col("text")), 2), 8), 2)).as("b"))
      .select(col("id"), col("b.band"), col("b.key"))
    val counts = bands.groupBy("band", "key").count().collect().map(_.getLong(2))
    assert(counts.forall(_ == 2), "every band bucket should contain both docs")
  }
}
