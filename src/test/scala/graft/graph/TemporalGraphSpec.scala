package graft.graph

import graft.SparkSpec
import graft.build.EventGraph
import graft.operators.ParityQueries

/** DataFrame-vs-GraphX differential tests (SURVEY.md §5): the same graph
  * analytics computed by the relational plans (oracle-checked) and by the
  * GraphX mirror must agree — the reference's plan-pair cross-check idea
  * lifted to engine pairs. The GraphX APIs return DataFrames (no driver-side
  * neighbor sets); tests collect only to compare. */
class TemporalGraphSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val g = EventGraph(spark, dir)
  private lazy val tg = TemporalGraph.fromEdges(
    g.frameInteractions.select("frame_id", "actor1", "actor2", "weight"))

  test("degrees match the relational c10 query") {
    val relational = ParityQueries.queries("c10_degree")(spark, dir)
      .select("actor_id", "degree")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val graphx = tg.degrees.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(graphx == relational)
  }

  test("neighbors match the relational c07 query") {
    val probe = g.probeActor1.collect()(0).getLong(0)
    val relational = ParityQueries.queries("c07_neighbors")(spark, dir)
      .select("actor_id").collect().map(_.getLong(0)).toSet
    assert(tg.neighborsOf(probe).collect().map(_.getLong(0)).toSet == relational)
  }

  test("common neighbors match the relational c09 query") {
    val a = g.probeActor1.collect()(0).getLong(0)
    val b = g.probeActor2.collect()(0).getLong(0)
    val relational = ParityQueries.queries("c09_common_neighbors")(spark, dir)
      .select("actor_id").collect().map(_.getLong(0)).toSet
    assert(tg.commonNeighbors(a, b).collect().map(_.getLong(0)).toSet == relational)
  }

  test("windowed ego triangles match the relational c11a query") {
    import org.apache.spark.sql.functions.col
    val Array(pd, ph) = g.probeDayHour.collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
    val wtg = TemporalGraph.atWindow(
      g.frameInteractions, g.frames, col("day") === pd && col("hour") === ph)
    val relational = ParityQueries.queries("c11a_ego_triangles")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // ego = highest-degree actor in the window, min id on ties (same probe rule)
    val ego = wtg.degrees.orderBy(col("degree").desc, col("actor_id")).collect()(0).getLong(0)
    assert(wtg.egoTrianglePairs(ego).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == relational)
  }
}
