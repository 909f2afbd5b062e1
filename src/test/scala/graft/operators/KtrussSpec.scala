package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.build.GraphCache

/** g15 k-truss: exact driver-side peel differential + the maximality and
  * truss-vs-core separation invariants. The hash oracle pins the values;
  * these pin the semantics against an independent implementation. */
class KtrussSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val K = 3

  private def dayEdgeSet: Set[(Long, Long)] = {
    val g = GraphCache(spark, dir)
    g.frameInteractions
      .filter(col("year") === g.probes.py && col("month") === g.probes.pm &&
        col("day") === g.probes.pdd)
      .select(col("actor1"), col("actor2")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  /** Naive peel: recompute per-edge triangle support within the current
    * set, drop edges under K−2, repeat to fixpoint. */
  private def naiveTruss(edges0: Set[(Long, Long)]): Map[(Long, Long), Long] = {
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
      val next = es.filter(e => sup.getOrElse(e, 0L) >= K - 2)
      done = next == es
      es = next
    }
    supports(es)
  }

  test("g15 equals the driver-side peel, edge for edge and support for support") {
    val got = GraphMetricsQueries.queries("g15_ktruss")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = naiveTruss(dayEdgeSet)
    assert(got == want, s"truss mismatch: got ${got.size}, want ${want.size}")
    assert(got.nonEmpty, "fixture should have a non-empty 3-truss")
    assert(got.size < dayEdgeSet.size, "the peel should drop tree/path edges")
    got.values.foreach(s => assert(s >= K - 2))
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
      assert(tri < K - 2,
        s"dropped edge ($a,$b) closes $tri triangles vs kept — peel not maximal")
    }
  }
}
