package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.build.GraphCache

/** g15/g17 k-truss: exact driver-side peel differential + the maximality
  * and truss-vs-core separation invariants, plus a planted cascade graph
  * that forces the round-11 INCREMENTAL support maintenance through
  * multiple decrement rounds (K=3 on real data converges in one round —
  * triangle-free edges break no triangles — so without the plant the
  * decrement path would never be exercised). The hash oracle pins the
  * values; these pin the semantics against an independent implementation. */
class KtrussSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def dayEdgeSet: Set[(Long, Long)] = {
    val g = GraphCache(spark, dir)
    g.frameInteractions
      .filter(col("year") === g.probes.py && col("month") === g.probes.pm &&
        col("day") === g.probes.pdd)
      .select(col("actor1"), col("actor2")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  /** Naive peel: recompute per-edge triangle support within the current
    * set from scratch, drop edges under k−2, repeat to fixpoint. */
  private def naiveTruss(edges0: Set[(Long, Long)], k: Int): Map[(Long, Long), Long] = {
    def supports(es: Set[(Long, Long)]): Map[(Long, Long), Long] = {
      val s = scala.collection.mutable.Map.empty[(Long, Long), Long]
      for ((a, b) <- es; (b2, c) <- es if b2 == b; if es.contains((a, c))) {
        s((a, b)) = s.getOrElse((a, b), 0L) + 1
        s((b, c)) = s.getOrElse((b, c), 0L) + 1
        s((a, c)) = s.getOrElse((a, c), 0L) + 1
      }
      s.toMap
    }
    var es = edges0
    var done = false
    while (!done) {
      val sup = supports(es)
      val next = es.filter(e => sup.getOrElse(e, 0L) >= k - 2)
      done = next == es
      es = next
    }
    supports(es)
  }

  test("g15 equals the driver-side peel, edge for edge and support for support") {
    val got = GraphMetricsQueries.queries("g15_ktruss")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = naiveTruss(dayEdgeSet, 3)
    assert(got == want, s"truss mismatch: got ${got.size}, want ${want.size}")
    assert(got.nonEmpty, "fixture should have a non-empty 3-truss")
    assert(got.size < dayEdgeSet.size, "the peel should drop tree/path edges")
    got.values.foreach(s => assert(s >= 1L))
  }

  test("g17 (K=4) equals the driver-side peel on the fixture day") {
    val got = GraphMetricsQueries.queries("g17_ktruss4")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = naiveTruss(dayEdgeSet, 4)
    assert(got == want, s"4-truss mismatch: got ${got.size}, want ${want.size}")
    got.values.foreach(s => assert(s >= 2L))
  }

  test("incremental peel survives a multi-round cascade (planted strip + K6 core)") {
    import spark.implicits._
    // triangle strip P²: edges (i,i+1) and (i,i+2) — end edges close one
    // triangle, interior edges two, so at K=4 the strip unravels from
    // both ends over several DECREMENT rounds; the K6 clique (every edge
    // in 4 triangles) must come through untouched with support 4
    val strip = (100L to 110L).flatMap(i =>
      Seq((i, i + 1), (i, i + 2)).filter(_._2 <= 111L))
    val k6 = for (a <- 1L to 6L; b <- (a + 1) to 6L) yield (a, b)
    val edges = (strip ++ k6).toDF("actor1", "actor2")
    val got = GraphMetricsQueries.ktruss(spark, edges, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = naiveTruss((strip ++ k6).toSet, 4)
    assert(got == want, s"cascade mismatch: got $got want $want")
    assert(got.keySet == k6.toSet, "only the K6 core should survive K=4")
    got.values.foreach(s => assert(s == 4L))
    // sanity on the plant itself: the naive peel needs >2 rounds, so the
    // incremental path really cycled (fixpoint in 1 round would mean the
    // decrement arm was never taken)
    var es: Set[(Long, Long)] = (strip ++ k6).toSet
    var rounds = 0
    var done = false
    while (!done) {
      val sup = naiveSupports(es)
      val next = es.filter(e => sup.getOrElse(e, 0L) >= 2L)
      done = next == es
      es = next
      rounds += 1
    }
    assert(rounds > 2, s"plant too weak: peel settled in $rounds rounds")
  }

  private def naiveSupports(es: Set[(Long, Long)]): Map[(Long, Long), Long] = {
    val s = scala.collection.mutable.Map.empty[(Long, Long), Long]
    for ((a, b) <- es; (b2, c) <- es if b2 == b; if es.contains((a, c))) {
      s((a, b)) = s.getOrElse((a, b), 0L) + 1
      s((b, c)) = s.getOrElse((b, c), 0L) + 1
      s((a, c)) = s.getOrElse((a, c), 0L) + 1
    }
    s.toMap
  }

  test("g15 maximality: no dropped edge re-qualifies against the kept set") {
    val kept = GraphMetricsQueries.queries("g15_ktruss")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val dropped = dayEdgeSet -- kept
    assert(dropped.nonEmpty)
    dropped.foreach { case (a, b) =>
      val es = kept + ((a, b))
      // triangles through (a,b) within kept ∪ {(a,b)}: count common
      // neighbors in the undirected sense over canonical pairs
      val nbrs = (x: Long) => es.collect {
        case (p, q) if p == x => q
        case (p, q) if q == x => p
      }
      val tri = nbrs(a).toSet.intersect(nbrs(b).toSet).size
      assert(tri < 1,
        s"dropped edge ($a,$b) closes $tri triangles vs kept — peel not maximal")
    }
  }
}
