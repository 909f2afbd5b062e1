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

  test("connected components and PageRank over the GEXF golden graph") {
    import graft.build.GraphBuilder
    import graft.sources.Gexf
    val gg = GraphBuilder.fromSpells(
      spark, Gexf.readSpells(spark, getClass.getResource("/golden.gexf").getPath), 20L)
    val tg2 = TemporalGraph.fromEdges(gg.frameInteractions)
    // edges (1,2) (1,3) (3,5) (4,6) -> components {1,2,3,5} and {4,6}
    val cc = tg2.connectedComponents.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 1L, 4L -> 4L, 6L -> 4L))
    val pr = tg2.pageRank().collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr.values.forall(_ > 0))
    // symmetric pair (4,6) must rank identically; hub 1 outranks leaf 2
    assert(math.abs(pr(4L) - pr(6L)) < 1e-6)
    assert(pr(1L) > pr(2L))
  }

  test("triangleCounts closes the triangle on an augmented window") {
    val s = spark
    import s.implicits._
    // triangle 1-2-3 plus pendant edge 3-4
    val edges = Seq((0L, 1L, 2L, 1L), (0L, 1L, 3L, 1L), (0L, 2L, 3L, 1L), (0L, 3L, 4L, 1L))
      .toDF("frame_id", "actor1", "actor2", "weight")
    val t = TemporalGraph.fromEdges(edges).triangleCounts
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(t == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 0L))
  }

  /** Per-day edge window straight off the event-graph tables — the same
    * derivation as the operators' at-rest day slices, rebuilt here so the
    * differential is independent of their cache. */
  private def dayWindow(y: Long, m: Long, dd: Long) = {
    import org.apache.spark.sql.functions.col
    val dayFrames = g.frames
      .filter(col("year") === y && col("month") === m && col("day") === dd)
      .select("frame_id")
    g.frameInteractions
      .join(dayFrames, Seq("frame_id"), "left_semi")
      .select("frame_id", "actor1", "actor2", "weight")
  }

  test("g10 per-day component stats match GraphX connectedComponents on sampled days") {
    import graft.operators.GraphMetricsQueries
    val rel = GraphMetricsQueries.queries("g10_component_evolution")(spark, dir)
      .collect()
    assert(rel.nonEmpty)
    // sample the first, middle, and last day of the evolution table
    for (row <- Seq(rel.head, rel(rel.length / 2), rel.last)) {
      val dkey = row.getLong(0)
      val tgDay = TemporalGraph.fromEdges(
        dayWindow(dkey / 10000, dkey / 100 % 100, dkey % 100))
      val sizes = tgDay.connectedComponents
        .groupBy("component").count()
        .collect().map(_.getLong(1))
      assert(sizes.sum == row.getLong(1), s"n_actors for day $dkey")
      assert(tgDay.edges.count() == row.getLong(2), s"n_edges for day $dkey")
      assert(sizes.length.toLong == row.getLong(3), s"n_components for day $dkey")
      assert(sizes.max == row.getLong(4), s"largest component for day $dkey")
    }
  }

  test("g13 BFS hops match GraphX ShortestPaths on the probe-day graph") {
    import graft.build.GraphCache
    import graft.operators.GraphMetricsQueries
    val p = GraphCache(spark, dir).probes
    val graphx = TemporalGraph.fromEdges(dayWindow(p.py, p.pm, p.pdd))
      .shortestHopsFrom(p.pa1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val relational = GraphMetricsQueries.queries("g13_bfs_hops")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(relational.nonEmpty && graphx == relational)
  }
}
