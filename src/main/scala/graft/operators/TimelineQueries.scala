package graft.operators

import java.time.Instant
import java.time.format.DateTimeFormatter
import java.time.ZoneOffset

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.build.{EventGraph, EventGraphSql, GraphCache, MaterializedGraph}
import graft.timeline.Timeline

/** The reference's timeline-index lookups (SURVEY.md §2.D) as oracle-checked
  * queries over the at-rest frame timeline ([[GraphCache]]). Anchors are
  * run-quartile timestamps computed from the collected run bounds (no
  * hard-coded epochs), mirrored exactly in the oracle CTE. All scans keep the
  * reference's EXCLUSIVE range-bound semantics
  * (`BaseTimeline.java:551,614,658,678`); point/range predicates push down to
  * the partitioned, frame-sorted parquet, which is what the reference's
  * sorted list + tree gave Neo4j. */
object TimelineQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d03_point_lookup" -> d03,
    "d05_ordered_scan" -> d05,
    "d06_range_after" -> d06,
    "d07_range_before" -> d07,
    "d08_range_between" -> d08,
    "d10_first_last" -> d10,
    "e04_date_string_lookup" -> e04)

  /** Quartile anchors (tlo, thi) on the Δ-grid, from the collected bounds —
    * integer arithmetic identical to the oracle's `anchors` CTE. */
  private def anchors(g: MaterializedGraph): (Long, Long) = {
    val d = g.delta
    val n = (g.probes.t1 - g.probes.t0) / d + 1
    (g.probes.t0 + (n / 4) * d, g.probes.t0 + ((3 * n) / 4) * d)
  }

  private val anchorsSql =
    s""",
       |anchors AS (
       |  SELECT t0 + (((t1 - t0) // ${EventGraph.DeltaSeconds} + 1) // 4) * ${EventGraph.DeltaSeconds} AS tlo,
       |         t0 + ((3 * ((t1 - t0) // ${EventGraph.DeltaSeconds} + 1)) // 4) * ${EventGraph.DeltaSeconds} AS thi
       |  FROM b
       |)""".stripMargin

  /** D3: point lookup at the probe frame's timestamp — pushed-down point
    * predicate over the sorted at-rest timeline. */
  private def d03(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val g = GraphCache(s, d)
    Timeline(g.frames).nodesAt(g.frameEpoch(g.probes.pf))
      .select($"frame_id", $"ts_start", $"year", $"month", $"day", $"hour")
      .orderBy($"frame_id")
  }

  /** D5: full ordered timeline scan. */
  private def d05(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Timeline(GraphCache(s, d).frames).allNodes.select($"frame_id", $"ts_start")
  }

  /** D6: nodes strictly after the upper quartile anchor. */
  private def d06(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val g = GraphCache(s, d)
    Timeline(g.frames).allAfter(anchors(g)._2)
      .select($"frame_id", $"ts_start").orderBy($"frame_id")
  }

  /** D7: nodes strictly before the lower quartile anchor. */
  private def d07(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val g = GraphCache(s, d)
    Timeline(g.frames).allBefore(anchors(g)._1)
      .select($"frame_id", $"ts_start").orderBy($"frame_id")
  }

  /** D8: exclusive-both-ends interquartile range scan. */
  private def d08(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val g = GraphCache(s, d)
    val (tlo, thi) = anchors(g)
    Timeline(g.frames).allBetween(tlo, thi)
      .select($"frame_id", $"ts_start").orderBy($"frame_id")
  }

  /** D10: first/last node + count. */
  private def d10(s: SparkSession, d: String): DataFrame =
    Timeline(GraphCache(s, d).frames).firstLast

  /** E4: `get_timeline_nodes_by_date` (`StructuredTimelinePlugin.java:74-89`)
    * — parse a "yyyy-MM-dd HH:mm:ss" date string, then point lookup. The
    * probe string is the probe frame's start rendered in UTC; the reference's
    * sec/ms unit bug (SURVEY §1.2) is deliberately NOT reproduced. */
  private def e04(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val g = GraphCache(s, d)
    val at = Instant.ofEpochSecond(g.frameEpoch(g.probes.pf))
    val dateStr = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
      .withZone(ZoneOffset.UTC).format(at)
    // guide §6 (the c11b discipline, round 15): the probe date is known at
    // plan time, and a frame's (year, month, day) partition is BY
    // CONSTRUCTION the UTC calendar date of its ts_start
    // (GraphBuilder.scala:93-95, session TZ pinned UTC) — so the equality
    // lookup implies its own day-partition predicate. Stating it explicitly
    // turns the whole-tree frames scan into a one-directory descent
    // (PartitionFilters); the seconds-precision string truncation cannot
    // move the calendar date, so this is a semantic no-op.
    val utc = at.atZone(ZoneOffset.UTC)
    Timeline(g.frames)
      .nodesAt(to_timestamp(lit(dateStr), "yyyy-MM-dd HH:mm:ss"))
      .filter($"year" === utc.getYear.toLong &&
        $"month" === utc.getMonthValue.toLong && $"day" === utc.getDayOfMonth.toLong)
      .select($"frame_id", $"ts_start", $"year", $"month", $"day", $"hour",
        $"minute", $"second")
      .orderBy($"frame_id")
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
        |FROM frames""".stripMargin),
    "e04_date_string_lookup" -> q(
      """SELECT f.frame_id, f.ts_start, f.year, f.month, f.day, f.hour,
        |       f.minute, f.second
        |FROM frames f,
        |     (SELECT strptime(strftime(ts_start, '%Y-%m-%d %H:%M:%S'),
        |                      '%Y-%m-%d %H:%M:%S') AS pts
        |      FROM frames JOIN probe_frame ON frame_id = pf) p
        |WHERE f.ts_start = p.pts
        |ORDER BY f.frame_id""".stripMargin))
}
