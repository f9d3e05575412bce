package graft

import org.apache.spark.sql.functions._
import graft.graph.ConnectedComponents

class ConnectedComponentsSpec extends SparkTestBase {

  test("components: chains, triangles, isolated nodes, min-id labels") {
    import spark.implicits._
    val nodes = (1L to 10L).toDF("doc_id")
    // components: {1,2,3,4} (chain), {5,6,7} (triangle), {8} {9} {10} isolated
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L), (6L, 7L), (5L, 7L))
      .toDF("a", "b")
    val got = ConnectedComponents.components(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 5L, 8L -> 8L, 9L -> 9L, 10L -> 10L))
    spark.catalog.clearCache()
  }

  test("canonicalize flags exactly one canonical per cluster") {
    import spark.implicits._
    val nodes = (1L to 6L).toDF("doc_id")
    val edges = Seq((2L, 4L), (4L, 6L), (1L, 3L)).toDF("a", "b")
    val rows = ConnectedComponents.canonicalize(nodes, edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val byComp = rows.groupBy(_._2)
    byComp.foreach { case (comp, members) =>
      val canon = members.filter(_._3)
      assert(canon.length == 1 && canon.head._1 == comp, s"component $comp")
    }
    assert(byComp.keySet == Set(1L, 2L, 5L))
    spark.catalog.clearCache()
  }

  test("already-converged input (self-loops only) ends at the first fold, maxIters=1") {
    import spark.implicits._
    // every incoming label equals the node's own -> zero fold-changes in
    // round 1 IS the fixpoint; with the old fingerprint-equality scheme this
    // still worked at maxIters=1 only because nothing ever changed — the
    // assert pins that the fold-detection path returns the identity labeling
    // without needing a second round
    val nodes = (1L to 4L).toDF("doc_id")
    val edges = Seq((1L, 1L), (3L, 3L)).toDF("a", "b")
    val got = ConnectedComponents.components(nodes, edges, maxIters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L))
    spark.catalog.clearCache()
  }

  test("iteration cap exhaustion fails loud instead of returning partial labels") {
    import spark.implicits._
    val n = 200L
    val nodes = (0L until n).toDF("doc_id")
    val edges = (0L until n - 1).map(i => (i, i + 1)).toDF("a", "b")
    // a 200-node path has diameter 199; two rounds of propagate + DOUBLE
    // pointer-halving cover ≤ ~35 hops (coverage ≲ 4^r growth), so the cap
    // must trip — the r06 second halving made the old 12-node/3-round
    // fixture converge legitimately
    val e = intercept[IllegalStateException] {
      ConnectedComponents.components(nodes, edges, maxIters = 2)
    }
    assert(e.getMessage.contains("did not converge"))
    spark.catalog.clearCache()
  }

  test("xxhash64-scale node ids converge without overflow (ANSI-safe fixpoint)") {
    import spark.implicits._
    // ids near Long extremes — a sum-of-labels fixpoint metric would throw
    // under ANSI arithmetic; the bit_xor fingerprint cannot overflow
    val ids = Seq(Long.MaxValue - 1, Long.MaxValue - 2, -9000000000000000000L, 5L)
    val nodes = ids.toDF("doc_id")
    val edges = Seq((Long.MaxValue - 1, Long.MaxValue - 2), (-9000000000000000000L, 5L)).toDF("a", "b")
    val got = ConnectedComponents.components(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(Long.MaxValue - 1) == Long.MaxValue - 2)
    assert(got(5L) == -9000000000000000000L)
    spark.catalog.clearCache()
  }

  test("long chain converges within the iteration budget (diameter rounds)") {
    import spark.implicits._
    val n = 10L
    val nodes = (0L until n).toDF("doc_id")
    val edges = (0L until n - 1).map(i => (i, i + 1)).toDF("a", "b")
    val got = ConnectedComponents.components(nodes, edges, maxIters = 25)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.toSet == Set(0L))
    spark.catalog.clearCache()
  }

  test("1000-node path graph (diameter 999) converges well under the cap — " +
    "pointer halving makes rounds O(log diameter)") {
    import spark.implicits._
    // a >25-long near-dup chain (drifting boilerplate) used to exhaust
    // maxIters and kill the run (VERDICT r03 #6); halving covers 2^k hops in
    // k rounds, so diameter 999 needs ~11 rounds + 1 to observe stability
    val n = 1000L
    val nodes = (0L until n).toDF("doc_id")
    val edges = (0L until n - 1).map(i => (i, i + 1)).toDF("a", "b")
    val got = ConnectedComponents.components(nodes, edges, maxIters = 15)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 1000 && got.values.toSet == Set(0L))
    spark.catalog.clearCache()
  }

  test("hot-label broadcast path (giant component) is exact: star graph with " +
    "threshold forcing every label through the broadcast resolution") {
    import spark.implicits._
    // a 500-node star around node 0 collapses to one giant component whose
    // label frequency is the whole graph — with hotThreshold=1 every halving
    // lookup runs through the broadcast map (the path VERDICT r04 #1 is
    // about), and the labeling must still equal the plain-join fixpoint
    val n = 500L
    val nodes = (0L until n).toDF("doc_id")
    val edges = (1L until n).map(i => (0L, i)).toDF("a", "b")
    val hot = ConnectedComponents.components(nodes, edges, hotThreshold = 1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hot.size == 500 && hot.values.toSet == Set(0L))
    spark.catalog.clearCache()
  }

  test("hot/cold split agrees with the plain join on a mixed graph " +
    "(one giant star + small components + isolated nodes)") {
    import spark.implicits._
    // giant star {0..99} (hot under threshold 10), a 5-chain {200..204}
    // (cold), a pair {300,301} (cold), isolated {400}
    val nodes = ((0L until 100L) ++ (200L to 204L) ++ Seq(300L, 301L, 400L)).toDF("doc_id")
    val edges = ((1L until 100L).map(i => (0L, i)) ++
      (200L until 204L).map(i => (i, i + 1)) ++ Seq((300L, 301L))).toDF("a", "b")
    val split = ConnectedComponents.components(nodes, edges, hotThreshold = 10L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val plain = ConnectedComponents.components(nodes, edges) // default: nothing hot
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(split == plain)
    assert(split.values.toSet == Set(0L, 200L, 300L, 400L))
    spark.catalog.clearCache()
  }
}
