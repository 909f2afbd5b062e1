package graft.graph

import org.apache.spark.graphx.{Edge, Graph, PartitionStrategy, VertexId}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GraphX mirror of the graph-analytic query surface (SURVEY.md §7.0.3): a
  * `Graph[Long, Int]` materialized per time window from the relational
  * tables, with degree / neighbor / common-neighbor / ego-triangle analytics
  * — the reference's C7–C11 semantics on the vertex-program engine instead of
  * DataFrame self-joins. The two implementations are cross-checked in
  * ScalaTest (`TemporalGraphSpec`), generalizing the reference's
  * plan-pair differential testing to engine pairs.
  *
  * Scale notes: edges partition by `EdgePartition2D` (grid partitioning
  * bounds any vertex's replication to 2√N partitions, taming hub actors);
  * windows are pre-filtered relationally BEFORE graph materialization, so the
  * graph only ever holds the pruned edge set — same structural optimization
  * as the reference's timeline-tree access path.
  */
final class TemporalGraph private (val graph: Graph[Long, Int]) {

  /** Degree per actor — C10's semantics (count of incident interactions). */
  def degrees: DataFrame = {
    val spark = SparkSession.active
    import spark.implicits._
    graph.degrees.map { case (v, d) => (v, d.toLong) }.toDF("actor_id", "degree")
  }

  /** Distinct neighbor ids of one actor — C7. */
  def neighborsOf(actor: Long): Set[Long] =
    graph.collectNeighborIds(org.apache.spark.graphx.EdgeDirection.Either)
      .lookup(actor).headOption.map(_.toSet).getOrElse(Set.empty)

  /** Common neighbors of two actors — C9. */
  def commonNeighbors(a: Long, b: Long): Set[Long] =
    neighborsOf(a).intersect(neighborsOf(b))

  /** Ego triangles — C11: pairs (n1 < n2) of ego-neighbors that are
    * themselves adjacent. */
  def egoTrianglePairs(ego: Long): Set[(Long, Long)] = {
    val nbrs = neighborsOf(ego)
    graph.edges
      .filter(e => nbrs.contains(e.srcId) && nbrs.contains(e.dstId))
      .map(e => (math.min(e.srcId, e.dstId), math.max(e.srcId, e.dstId)))
      .distinct().collect().toSet
  }
}

object TemporalGraph {

  /** Build from a frame-scoped edge table (`actor1`, `actor2`, `weight`),
    * e.g. `EventGraph.frameInteractions` filtered to a window. Edges collapse
    * to one per unordered pair with summed weight. */
  def fromEdges(edges: DataFrame): TemporalGraph = {
    val rows = edges
      .groupBy(col("actor1"), col("actor2"))
      .agg(sum(col("weight")).cast("int").as("w"))
    val edgeRdd = rows.rdd.map(r =>
      Edge(r.getLong(0): VertexId, r.getLong(1): VertexId, r.getInt(2)))
    val g = Graph.fromEdges(edgeRdd, defaultValue = 0L)
      .partitionBy(PartitionStrategy.EdgePartition2D)
    new TemporalGraph(g)
  }

  /** Window-scoped build: pre-filter frames relationally (partition-pruned
    * scan), then materialize only the surviving edges. */
  def atWindow(frameInteractions: DataFrame, frames: DataFrame,
      pred: org.apache.spark.sql.Column): TemporalGraph = {
    val windowFrames = frames.filter(pred).select("frame_id")
    fromEdges(frameInteractions.join(windowFrames, Seq("frame_id"), "left_semi"))
  }
}
