package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.build.GraphCache

/** g16 per-day assortativity: exact driver-side recompute per day, plus
  * consistency with the declared probe-day g07 value (same edge set →
  * bit-identical r). */
class AssortEvolutionSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("g16 equals a driver-side per-day moment recompute") {
    val g = GraphCache(spark, dir)
    val edges = g.frameInteractions
      .select((col("year") * 10000 + col("month") * 100 + col("day"))
        .cast("long").as("dkey"), col("actor1"), col("actor2"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val got = GraphMetricsQueries.queries("g16_assortativity_evolution")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val byDay = edges.groupBy(_._1)
    assert(got.keySet == byDay.keySet)
    byDay.foreach { case (dk, es) =>
      val und = es.flatMap { case (_, a, b) => Seq((a, b), (b, a)) }
      val deg = und.groupBy(_._1).map { case (v, xs) => v -> xs.length.toLong }
      val n = und.length.toLong
      val sx = und.map(e => deg(e._1)).sum
      val sxy = und.map(e => deg(e._1) * deg(e._2)).sum
      val sxx = und.map(e => deg(e._1) * deg(e._1)).sum
      val den = n.toDouble * sxx - sx.toDouble * sx
      val want = if (den != 0.0) (n.toDouble * sxy - sx.toDouble * sx) / den else 0.0
      val (gn, gr) = got(dk)
      assert(gn == n, s"day $dk directed-edge count $gn != $n")
      assert(gr == want, s"day $dk assortativity $gr != $want")
    }
  }

  test("g16's probe-day row equals the declared g07 value") {
    val g = GraphCache(spark, dir)
    val p = g.probes
    val dk = p.py.toLong * 10000 + p.pm * 100 + p.pdd
    val g07 = GraphMetricsQueries.queries("g07_assortativity")(spark, dir).collect()(0)
    val row = GraphMetricsQueries.queries("g16_assortativity_evolution")(spark, dir)
      .filter(col("dkey") === dk).collect()(0)
    assert(row.getLong(1) == g07.getLong(0), "directed-edge counts must agree")
    assert(row.getDouble(2) == g07.getDouble(1),
      "the probe-day curve point must be bit-identical to g07")
  }
}
