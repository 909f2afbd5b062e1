package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.build.{EventGraph, EventGraphSql}
import graft.timeline.Timeline

/** The reference's timeline-index lookups (SURVEY.md §2.D) as oracle-checked
  * queries over the frame timeline. Anchors are run-quartile timestamps
  * computed from the data (no hard-coded epochs), mirrored exactly in the
  * oracle CTE. All scans keep the reference's EXCLUSIVE range-bound semantics
  * (`BaseTimeline.java:551,614,658,678`). */
object TimelineQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d03_point_lookup" -> d03,
    "d05_ordered_scan" -> d05,
    "d06_range_after" -> d06,
    "d07_range_before" -> d07,
    "d08_range_between" -> d08,
    "d10_first_last" -> d10)

  /** Quartile anchors (tlo, thi) on the Δ-grid, derived from run bounds. */
  private def anchors(g: EventGraph): DataFrame = {
    val d = g.delta
    g.bounds.select(
      expr(s"t0 + (((t1 - t0) div $d + 1) div 4) * $d").as("tlo"),
      expr(s"t0 + ((3 * ((t1 - t0) div $d + 1)) div 4) * $d").as("thi"))
  }

  private val anchorsSql =
    s""",
       |anchors AS (
       |  SELECT t0 + (((t1 - t0) // ${EventGraph.DeltaSeconds} + 1) // 4) * ${EventGraph.DeltaSeconds} AS tlo,
       |         t0 + ((3 * ((t1 - t0) // ${EventGraph.DeltaSeconds} + 1)) // 4) * ${EventGraph.DeltaSeconds} AS thi
       |  FROM b
       |)""".stripMargin

  /** D3: point lookup at the probe frame's timestamp. */
  private def d03(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val g = EventGraph(s, d)
    val at = g.frames.join(broadcast(g.probeFrame), $"frame_id" === $"pf")
      .select($"ts_start".as("pts"))
    Timeline(g.frames.crossJoin(broadcast(at))).nodesAt($"pts")
      .select($"frame_id", $"ts_start", $"year", $"month", $"day", $"hour")
      .orderBy($"frame_id")
  }

  /** D5: full ordered timeline scan. */
  private def d05(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val g = EventGraph(s, d)
    Timeline(g.frames).allNodes.select($"frame_id", $"ts_start")
  }

  /** D6: nodes strictly after the upper quartile anchor. */
  private def d06(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val g = EventGraph(s, d)
    Timeline(g.frames.crossJoin(broadcast(anchors(g))))
      .allAfter(timestamp_seconds($"thi"))
      .select($"frame_id", $"ts_start").orderBy($"frame_id")
  }

  /** D7: nodes strictly before the lower quartile anchor. */
  private def d07(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val g = EventGraph(s, d)
    Timeline(g.frames.crossJoin(broadcast(anchors(g))))
      .allBefore(timestamp_seconds($"tlo"))
      .select($"frame_id", $"ts_start").orderBy($"frame_id")
  }

  /** D8: exclusive-both-ends interquartile range scan. */
  private def d08(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val g = EventGraph(s, d)
    Timeline(g.frames.crossJoin(broadcast(anchors(g))))
      .allBetween(timestamp_seconds($"tlo"), timestamp_seconds($"thi"))
      .select($"frame_id", $"ts_start").orderBy($"frame_id")
  }

  /** D10: first/last node + count. */
  private def d10(s: SparkSession, d: String): DataFrame = {
    val g = EventGraph(s, d)
    Timeline(g.frames).firstLast
  }

  private def q(select: String): String = EventGraphSql.query(select)
  private def qa(select: String): String =
    s"WITH ${EventGraphSql.prelude}$anchorsSql\n$select"

  def oracleSql: Map[String, String] = Map(
    "d03_point_lookup" -> q(
      """SELECT f.frame_id, f.ts_start, f.year, f.month, f.day, f.hour
        |FROM frames f, (SELECT ts_start AS pts FROM frames JOIN probe_frame ON frame_id = pf) p
        |WHERE f.ts_start = p.pts
        |ORDER BY f.frame_id""".stripMargin),
    "d05_ordered_scan" -> q(
      "SELECT frame_id, ts_start FROM frames ORDER BY ts_start"),
    "d06_range_after" -> qa(
      """SELECT frame_id, ts_start FROM frames, anchors
        |WHERE ts_start > make_timestamp(thi * 1000000)
        |ORDER BY frame_id""".stripMargin),
    "d07_range_before" -> qa(
      """SELECT frame_id, ts_start FROM frames, anchors
        |WHERE ts_start < make_timestamp(tlo * 1000000)
        |ORDER BY frame_id""".stripMargin),
    "d08_range_between" -> qa(
      """SELECT frame_id, ts_start FROM frames, anchors
        |WHERE ts_start > make_timestamp(tlo * 1000000)
        |  AND ts_start < make_timestamp(thi * 1000000)
        |ORDER BY frame_id""".stripMargin),
    "d10_first_last" -> q(
      """SELECT min(ts_start) AS first_ts, max(ts_start) AS last_ts,
        |  COUNT(*) AS n_nodes
        |FROM frames""".stripMargin))
}
