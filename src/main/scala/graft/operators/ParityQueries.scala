package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.build.{EventGraphSql, GraphCache, MaterializedGraph}

/** The reference's 14-query benchmark surface (SURVEY.md §2.C), re-expressed
  * over the materialized dynamic graph. Query numbering mirrors the reference
  * registry (`cypher_query_timing.py:207-212`); the b/c variants are the
  * reference's hand-written plan alternates (Q5b, Q6b, Q9b, Q11b/c) —
  * semantically equal, formulated differently so Catalyst plans them
  * differently; the driver oracle-checks each one and ScalaTest cross-checks
  * variants against each other (the reference's own differential trick).
  *
  * Access-path design (round-2): queries read the AT-REST tables
  * ([[GraphCache]]) — parquet partitioned by (year, month, day), sorted by
  * frame_id, memberships carrying a denormalized `hour` — with probe
  * entities collected once as literals. A probe-scoped query therefore
  * compiles to a partition-pruned scan with pushed filters (PartitionFilters
  * + PushedFilters in the plan), exactly the role of the reference's
  * timeline-tree descent (`StructuredTimeline.java:62-108`), instead of
  * re-deriving the graph from raw events per query. The only wide shuffles
  * left are the aggregates keyed on actor/frame ids; actor-name lookups are
  * broadcast hash joins. The triangle queries (c11*) pre-filter the edge set
  * to the probe hour BEFORE any self-join — the same structural optimization
  * the reference's tree provides (`cypher_query_timing.py:161-170`) — so the
  * join pyramid runs over a tiny edge set even at 100 TB of events.
  */
object ParityQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c01_frame_range_scan" -> c01,
    "c02_snapshot_actors" -> c02,
    "c03_snapshot_interactions" -> c03,
    "c04_actor_activity" -> c04,
    "c05_active_actors" -> c05,
    "c05b_active_actors_alt" -> c05b,
    "c06_actor_days" -> c06,
    "c06b_actor_days_denorm" -> c06b,
    "c07_neighbors" -> c07,
    "c08_neighbors_on_day" -> c08,
    "c09_common_neighbors" -> c09,
    "c09b_common_neighbors_4hop" -> c09b,
    "c10_degree" -> c10,
    "c11a_ego_triangles" -> c11a,
    "c11b_ego_triangles_anchored" -> c11b,
    "c11c_ego_triangles_denorm" -> c11c,
    "c13_contact_gaps" -> c13,
    "c14_contact_matrix" -> c14)

  /** The `other endpoint` of canonicalized undirected edges incident to the
    * literal probe actor — Cypher's 2-hop-via-hypernode pattern collapsed to
    * one predicate (SURVEY §2.C C7). */
  private def incidentOther(edges: DataFrame, p: Long): DataFrame =
    edges.filter(col("actor1") === p || col("actor2") === p)
      .select(when(col("actor1") === p, col("actor2")).otherwise(col("actor1")).as("actor_id"))
      .distinct()

  /** Point access to one frame's membership rows: partition predicates on the
    * frame's (year, month, day) + the frame_id filter — partition pruning
    * descends to the day directory, the sorted-by-frame_id row groups skip
    * the rest (the reference's tree descent + list scan). */
  private def atFrame(table: DataFrame, g: MaterializedGraph, frameId: Long): DataFrame = {
    val (y, m, d) = g.frameDate(frameId)
    table.filter(col("year") === y && col("month") === m && col("day") === d &&
      col("frame_id") === frameId)
  }

  /** c13: per-actor inter-contact gap statistics over the whole run — the
    * burstiness texture of each actor's activation timeline (dense regular
    * contact vs long-silence bursts), the temporal complement of C4's flat
    * activity count. One window pass per actor ordered by frame (a single
    * hash shuffle — the a02 sessionization shape over membership rows), then
    * a partial+final agg. The gap sum telescopes (last − first frame), so
    * `mean_gap` is one integer/integer double division — exact on both
    * engines; single-activation actors report null gaps on both. */
  private def c13(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val g = GraphCache(s, d)
    val w = Window.partitionBy($"actor_id").orderBy($"frame_id")
    g.frameActors
      .select($"actor_id", $"frame_id")
      .withColumn("gap", $"frame_id" - lag($"frame_id", 1).over(w))
      .groupBy($"actor_id")
      .agg(count(lit(1)).as("n_frames"),
        max($"gap").as("max_gap"),
        (sum($"gap").cast("double") / count($"gap")).as("mean_gap"))
      .orderBy($"actor_id")
  }

  /** c14: the aggregated weighted contact network — per canonical actor
    * pair over the whole run, co-active frame count, cumulative contact
    * weight, and the first/last activation frame. This is the
    * time-collapsed summary the SocioPatterns line publishes as "the
    * contact matrix" (the GRADES'13 paper's aggregated network; the
    * per-frame `weight` the loader writes — `load_gexf_to_neo4j.py:248` —
    * exists to be summed like this). One partial+final hash aggregate
    * keyed on the pair: shuffle volume is |distinct pairs|, not
    * |frame-edges|, the same map-side-combine shape as C4/C10. */
  private def c14(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val g = GraphCache(s, d)
    g.frameInteractions
      .groupBy($"actor1", $"actor2")
      .agg(count(lit(1)).as("n_frames"),
        sum($"weight").as("total_weight"),
        min($"frame_id").as("first_frame"),
        max($"frame_id").as("last_frame"))
      .orderBy($"actor1", $"actor2")
  }

  /** C1/QUERY1: frames of the 9–12h window on the busiest (year, month, day)
    * probe date, ordered — the timeline-tree descent is partition/predicate
    * pruning. The date anchor is data-derived (GraphProbes), unlike the
    * reference's hard-coded 2009-07-01 (`cypher_query_timing.py:120`), so the
    * scan stays non-degenerate on any corpus span; the frame grid is dense
    * (B4), so an in-span date always yields rows. */
  private def c01(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val g = GraphCache(s, d)
    g.frames
      .filter($"year" === g.probes.py && $"month" === g.probes.pm &&
        $"day" === g.probes.pdd && $"hour".between(9, 12))
      .select($"frame_id", $"ts_start", $"hour")
      .orderBy($"ts_start")
  }

  /** C2/QUERY2: actor names present in the probe frame. */
  private def c02(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val g = GraphCache(s, d)
    atFrame(g.frameActors, g, g.probes.pf)
      .join(g.actors, "actor_id")
      .select($"name")
      .orderBy($"name")
  }

  /** C3/QUERY3: interactions of the probe frame with weight > 0. */
  private def c03(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val g = GraphCache(s, d)
    atFrame(g.frameInteractions, g, g.probes.pf)
      .filter($"weight" > 0)
      .select($"actor1", $"actor2", $"weight")
      .orderBy($"actor1", $"actor2")
  }

  /** C4/QUERY4: frames-present count per actor over the whole run. */
  private def c04(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val g = GraphCache(s, d)
    g.frameActors.groupBy($"actor_id").agg(count(lit(1)).as("freq"))
      .join(g.actors, "actor_id")
      .select($"actor_id", $"name", $"freq")
      .orderBy($"actor_id")
  }

  /** C5/QUERY5: C4 + HAVING freq > threshold + ORDER BY freq DESC. */
  private def c05(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val g = GraphCache(s, d)
    g.frameActors.groupBy($"actor_id").agg(count(lit(1)).as("freq"))
      .filter($"freq" > 50)
      .join(g.actors, "actor_id")
      .select($"actor_id", $"name", $"freq")
      .orderBy(desc("freq"), $"actor_id")
  }

  /** C5b/QUERY5b: same result, alternate two-stage formulation (join the
    * names first, aggregate after — the reference's hand-written plan B). */
  private def c05b(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val g = GraphCache(s, d)
    g.frameActors.join(g.actors, "actor_id")
      .groupBy($"actor_id", $"name").agg(count(lit(1)).as("freq"))
      .filter($"freq" > 50)
      .select($"actor_id", $"name", $"freq")
      .orderBy(desc("freq"), $"actor_id")
  }

  /** C6/QUERY6: distinct active days of the probe actor. The at-rest layout
    * answers this from the membership table's own partition column — no
    * frames join (the denormalization IS the native layout). */
  private def c06(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val g = GraphCache(s, d)
    g.frameActors.filter($"actor_id" === g.probes.pa1)
      .select($"day").distinct()
      .orderBy($"day")
  }

  /** C6b/QUERY6b: same via an explicit frames join (the reference's
    * tree-access variant). */
  private def c06b(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val g = GraphCache(s, d)
    g.frames.select($"frame_id", $"day".as("fday"))
      .join(g.frameActors.filter($"actor_id" === g.probes.pa1), "frame_id")
      .select($"fday".as("day")).dropDuplicates("day")
      .orderBy($"day")
  }

  /** C7/QUERY7: neighbor list of the probe actor, ordered by name. */
  private def c07(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val g = GraphCache(s, d)
    incidentOther(g.interactions, g.probes.pa1)
      .join(g.actors, "actor_id")
      .select($"actor_id", $"name")
      .orderBy($"name")
  }

  /** C8/QUERY8: distinct neighbors whose shared interaction is active on the
    * probe day — a partition-pruned scan of the membership table. */
  private def c08(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val g = GraphCache(s, d)
    val active = g.frameInteractions.filter($"day" === g.probes.pd)
      .select($"actor1", $"actor2")
    incidentOther(active, g.probes.pa1)
      .join(g.actors, "actor_id")
      .select($"actor_id", $"name")
      .orderBy($"name")
  }

  /** C9/QUERY9: common neighbors of the two probe actors (INTERSECT). */
  private def c09(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val g = GraphCache(s, d)
    incidentOther(g.interactions, g.probes.pa1)
      .intersect(incidentOther(g.interactions, g.probes.pa2))
      .join(g.actors, "actor_id")
      .select($"actor_id", $"name")
      .orderBy($"actor_id")
  }

  /** C9b/QUERY9b: same via the pure 4-hop pattern (equi-join of the two
    * neighbor sets — the reference's plan B, `cypher_query_timing.py:144-148`). */
  private def c09b(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val g = GraphCache(s, d)
    val n1 = incidentOther(g.interactions, g.probes.pa1)
    val n2 = incidentOther(g.interactions, g.probes.pa2)
    n1.join(n2, "actor_id")
      .join(g.actors, "actor_id")
      .select($"actor_id", $"name")
      .orderBy($"actor_id")
  }

  /** C10/QUERY10: degree per actor (interaction endpoints), ORDER BY DESC. */
  private def c10(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val g = GraphCache(s, d)
    val endpoints = g.interactions.select($"actor1".as("actor_id"))
      .unionAll(g.interactions.select($"actor2".as("actor_id")))
    endpoints.groupBy($"actor_id").agg(count(lit(1)).as("degree"))
      .join(g.actors, "actor_id")
      .select($"actor_id", $"name", $"degree")
      .orderBy(desc("degree"), $"actor_id")
  }

  /** Edges active in the probe (day, hour) window — the pre-filter all c11
    * variants share. At rest this is one pruned scan: day is the partition
    * directory, hour a pushed filter on the denormalized column. */
  private def activeHourEdges(g: MaterializedGraph): DataFrame =
    g.frameInteractions
      .filter(col("day") === g.probes.pdhDay && col("hour") === g.probes.pdhHour)
      .select(col("actor1"), col("actor2")).distinct()

  /** Ego = highest-degree actor within the active window (deterministic probe). */
  private def windowEgo(active: DataFrame): DataFrame = {
    active.select(col("actor1").as("actor_id"))
      .unionAll(active.select(col("actor2").as("actor_id")))
      .groupBy(col("actor_id")).agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), col("actor_id")).limit(1)
      .select(col("actor_id").as("pe"))
  }

  private def egoIncident(edges: DataFrame, ego: DataFrame): DataFrame = {
    edges.join(broadcast(ego), col("actor1") === col("pe") || col("actor2") === col("pe"))
      .select(when(col("actor1") === col("pe"), col("actor2"))
        .otherwise(col("actor1")).as("actor_id"))
      .distinct()
  }

  private def triangles(active: DataFrame, ego: DataFrame): DataFrame = {
    val nb = egoIncident(active, ego)
    active
      .join(nb.withColumnRenamed("actor_id", "actor1"), Seq("actor1"), "left_semi")
      .join(nb.withColumnRenamed("actor_id", "actor2"), Seq("actor2"), "left_semi")
      .select(col("actor1").as("n1"), col("actor2").as("n2"))
      .orderBy(col("n1"), col("n2"))
  }

  /** C11a/QUERY11a: ego triangles inside the probe (day, hour) window:
    * distinct pairs (n1, n2) both adjacent to the ego and to each other,
    * all three edges active in the window. */
  private def c11a(s: SparkSession, d: String): DataFrame = {
    val g = GraphCache(s, d)
    val active = activeHourEdges(g)
    triangles(active, windowEgo(active))
  }

  /** C11b/QUERY11b: same semantics, hour window resolved on the frames table
    * first and the edge set restricted by left-semi join on frame ids (the
    * reference's pre-resolved-anchor plan). */
  private def c11b(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val g = GraphCache(s, d)
    val hourFrames = g.frames
      .filter($"day" === g.probes.pdhDay && $"hour" === g.probes.pdhHour)
      .select($"frame_id")
    // round 14: the anchor's day is known at plan time, so the semi-join
    // formulation still PRUNES the day partition (every resolved frame id
    // lives in the anchor day's directory — deriving the implied partition
    // predicate is a no-op on the result and retires the full-table scan
    // this variant paid; the hour restriction stays with the semi-join,
    // which is the formulation c11b exists to exercise)
    val active = g.frameInteractions
      .filter($"day" === g.probes.pdhDay)
      .join(broadcast(hourFrames), Seq("frame_id"), "left_semi")
      .select($"actor1", $"actor2").distinct()
    triangles(active, windowEgo(active))
  }

  /** C11c/QUERY11c: same via the denormalized date columns carried through a
    * frames join (the reference's Q11c formulation). */
  private def c11c(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val g = GraphCache(s, d)
    val active = g.frames.select($"frame_id", $"day".as("fd"), $"hour".as("fh"))
      .join(g.frameInteractions.select($"frame_id", $"actor1", $"actor2"), "frame_id")
      .filter($"fd" === g.probes.pdhDay && $"fh" === g.probes.pdhHour)
      .select($"actor1", $"actor2").distinct()
    triangles(active, windowEgo(active))
  }

  // ---------------------------------------------------------------- oracle --

  private def q(select: String): String = EventGraphSql.query(select)

  private val neighborsOf =
    """SELECT DISTINCT CASE WHEN actor1 = %s THEN actor2 ELSE actor1 END AS actor_id
      |FROM inter, %s WHERE actor1 = %s OR actor2 = %s""".stripMargin

  def oracleSql: Map[String, String] = {
    val c05Sql = q(
      """SELECT f.actor_id, a.name, f.freq FROM (
        |  SELECT actor_id, COUNT(*) AS freq FROM fa GROUP BY actor_id HAVING COUNT(*) > 50
        |) f JOIN actors a USING (actor_id)
        |ORDER BY f.freq DESC, f.actor_id""".stripMargin)
    val c06Sql = q(
      """SELECT DISTINCT f.day FROM fa
        |JOIN frames f USING (frame_id)
        |JOIN probe_a1 ON fa.actor_id = pa1
        |ORDER BY f.day""".stripMargin)
    val c09Sql = q(
      s"""SELECT n.actor_id, a.name FROM (
         |  ${neighborsOf.format("pa1", "probe_a1", "pa1", "pa1")}
         |  INTERSECT
         |  ${neighborsOf.format("pa2", "probe_a2", "pa2", "pa2")}
         |) n JOIN actors a USING (actor_id)
         |ORDER BY n.actor_id""".stripMargin)
    val c11Sql = q(
      """SELECT n1, n2 FROM (
        |  WITH active AS (
        |    SELECT DISTINCT fi.actor1, fi.actor2
        |    FROM fi JOIN frames USING (frame_id), probe_day_hour
        |    WHERE frames.day = pd AND frames.hour = ph
        |  ),
        |  ego AS (
        |    SELECT actor_id AS pe FROM (
        |      SELECT actor1 AS actor_id FROM active
        |      UNION ALL SELECT actor2 FROM active
        |    ) e GROUP BY actor_id ORDER BY COUNT(*) DESC, actor_id LIMIT 1
        |  ),
        |  nb AS (
        |    SELECT DISTINCT CASE WHEN actor1 = pe THEN actor2 ELSE actor1 END AS n
        |    FROM active, ego WHERE actor1 = pe OR actor2 = pe
        |  )
        |  SELECT a.actor1 AS n1, a.actor2 AS n2 FROM active a
        |  WHERE a.actor1 IN (SELECT n FROM nb) AND a.actor2 IN (SELECT n FROM nb)
        |) t ORDER BY n1, n2""".stripMargin)

    Map(
      "c01_frame_range_scan" -> q(
        """SELECT frame_id, ts_start, hour FROM frames, probe_date
          |WHERE year = py AND month = pm AND day = pdd AND hour BETWEEN 9 AND 12
          |ORDER BY ts_start""".stripMargin),
      "c02_snapshot_actors" -> q(
        """SELECT a.name FROM fa
          |JOIN probe_frame ON fa.frame_id = pf
          |JOIN actors a USING (actor_id)
          |ORDER BY a.name""".stripMargin),
      "c03_snapshot_interactions" -> q(
        """SELECT actor1, actor2, weight FROM fi
          |JOIN probe_frame ON fi.frame_id = pf
          |WHERE weight > 0
          |ORDER BY actor1, actor2""".stripMargin),
      "c04_actor_activity" -> q(
        """SELECT f.actor_id, a.name, f.freq FROM (
          |  SELECT actor_id, COUNT(*) AS freq FROM fa GROUP BY actor_id
          |) f JOIN actors a USING (actor_id)
          |ORDER BY f.actor_id""".stripMargin),
      "c05_active_actors" -> c05Sql,
      "c05b_active_actors_alt" -> c05Sql,
      "c06_actor_days" -> c06Sql,
      "c06b_actor_days_denorm" -> c06Sql,
      "c07_neighbors" -> q(
        s"""SELECT n.actor_id, a.name FROM (
           |  ${neighborsOf.format("pa1", "probe_a1", "pa1", "pa1")}
           |) n JOIN actors a USING (actor_id)
           |ORDER BY a.name""".stripMargin),
      "c08_neighbors_on_day" -> q(
        """SELECT n.actor_id, a.name FROM (
          |  SELECT DISTINCT CASE WHEN actor1 = pa1 THEN actor2 ELSE actor1 END AS actor_id
          |  FROM (
          |    SELECT fi.actor1, fi.actor2 FROM fi
          |    JOIN frames USING (frame_id)
          |    JOIN probe_day ON frames.day = pd
          |  ) act, probe_a1
          |  WHERE actor1 = pa1 OR actor2 = pa1
          |) n JOIN actors a USING (actor_id)
          |ORDER BY a.name""".stripMargin),
      "c09_common_neighbors" -> c09Sql,
      "c09b_common_neighbors_4hop" -> c09Sql,
      "c10_degree" -> q(
        """SELECT e.actor_id, a.name, COUNT(*) AS degree FROM (
          |  SELECT actor1 AS actor_id FROM inter
          |  UNION ALL SELECT actor2 FROM inter
          |) e JOIN actors a ON e.actor_id = a.actor_id
          |GROUP BY e.actor_id, a.name
          |ORDER BY degree DESC, e.actor_id""".stripMargin),
      "c11a_ego_triangles" -> c11Sql,
      "c11b_ego_triangles_anchored" -> c11Sql,
      "c11c_ego_triangles_denorm" -> c11Sql,
      // telescoping integer sum / integer count — one exact double division
      "c13_contact_gaps" -> q(
        """SELECT actor_id,
          |       CAST(COUNT(*) AS BIGINT) AS n_frames,
          |       CAST(MAX(gap) AS BIGINT) AS max_gap,
          |       CAST(SUM(gap) AS DOUBLE) / COUNT(gap) AS mean_gap
          |FROM (
          |  SELECT actor_id, frame_id,
          |         frame_id - lag(frame_id) OVER (PARTITION BY actor_id
          |                                        ORDER BY frame_id) AS gap
          |  FROM fa) g
          |GROUP BY actor_id
          |ORDER BY actor_id""".stripMargin),
      "c14_contact_matrix" -> q(
        """SELECT actor1, actor2,
          |       CAST(COUNT(*) AS BIGINT) AS n_frames,
          |       CAST(SUM(weight) AS BIGINT) AS total_weight,
          |       CAST(MIN(frame_id) AS BIGINT) AS first_frame,
          |       CAST(MAX(frame_id) AS BIGINT) AS last_frame
          |FROM fi
          |GROUP BY actor1, actor2
          |ORDER BY actor1, actor2""".stripMargin))
  }
}
