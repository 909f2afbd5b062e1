package graft.build

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Derivation of the reference's dynamic-graph model (SURVEY.md §1.3) from the
  * driver's `events` table (FIXTURES.md §4).
  *
  * The reference ingests timestamped interaction spells and discretizes them
  * into fixed-Δ frames at load time (reference `load_gexf_to_neo4j.py:69-98`);
  * every temporal query then becomes an equi-join/filter on `frame_id` or the
  * denormalized date columns — its best design idea, kept here. `events` rows
  * are point observations: actor = `user_id`, and two users *interact* in a
  * frame when they produce the same `event_type` within it; `weight` counts
  * the shared event types (generalizes the loader's weight=1 contact links,
  * `load_gexf_to_neo4j.py:240-250`). Edges are canonicalized `actor1 < actor2`
  * and deduplicated, exactly like the reference (`load_gexf_to_neo4j.py:201-204`).
  *
  * Every step is a pure Catalyst expression / relational op, so the identical
  * derivation is expressible in the DuckDB oracle (EventGraphSql) and the two
  * engines hash-match.
  *
  * Scale design (100 TB): all epoch arithmetic is per-row and codegen'd; the
  * `bounds` aggregate is a 2-value broadcast; `distinct` presences and the
  * co-occurrence self-join shuffle on (frame_id, event_type), whose group
  * sizes are bounded by per-frame activity — the classic bounded co-occurrence
  * join. Frame enumeration is `sequence`-based here (frame count is bounded by
  * time span, not data volume); GraphBuilder's materialization path uses
  * `spark.range` for unbounded spans. Hub (frame_id, event_type) keys at
  * extreme skew are handled by AQE skew-join splitting (enabled in Verify/
  * Bench sessions).
  */
final class EventGraph(spark: SparkSession, dir: String, val delta: Long = EventGraph.DeltaSeconds) {
  import spark.implicits._

  /** Raw events with a `ts` normalized to TimestampType. */
  val events: DataFrame = Tables.events(spark, dir)

  /** Single-row (t0, t1): epoch-second bounds of the run, the grid origin
    * (reference START_TIME/STOP_TIME — `load_gexf_to_neo4j.py:95-98`). */
  val bounds: DataFrame = events.agg(
    min(unix_timestamp($"ts")).as("t0"),
    max(unix_timestamp($"ts")).as("t1"))

  /** Events tagged with their frame_id on the Δ-grid anchored at t0. */
  val ev: DataFrame = events
    .crossJoin(broadcast(bounds))
    .withColumn("secs", unix_timestamp($"ts"))
    .withColumn("frame_id", expr(s"(secs - t0) div $delta"))
    .select($"event_id", $"user_id", $"event_type", $"value", $"frame_id")

  /** Dense frame table: one row per Δ-slot covering [t0, t1], empty slots
    * included (reference `load_gexf_to_neo4j.py:170`), with denormalized UTC
    * date parts (reference `load_gexf_to_neo4j.py:137-142`). */
  val frames: DataFrame = bounds
    .select(explode(sequence(lit(0L), expr(s"(t1 - t0) div $delta"))).as("frame_id"), $"t0")
    .withColumn("ts_start", timestamp_seconds($"t0" + $"frame_id" * lit(delta)))
    .withColumn("ts_end", timestamp_seconds($"t0" + ($"frame_id" + 1) * lit(delta)))
    .select(
      $"frame_id",
      $"ts_start",
      $"ts_end",
      lit(delta).as("length"),
      year($"ts_start").cast("long").as("year"),
      month($"ts_start").cast("long").as("month"),
      dayofmonth($"ts_start").cast("long").as("day"),
      hour($"ts_start").cast("long").as("hour"),
      minute($"ts_start").cast("long").as("minute"),
      second($"ts_start").cast("long").as("second"))

  /** Actor catalog with reference-style names (`load_gexf_to_neo4j.py:213`). */
  val actors: DataFrame = events
    .select($"user_id".as("actor_id")).distinct()
    .withColumn("name", concat(lit("ACTOR_"), lpad($"actor_id".cast("string"), 4, "0")))

  /** FRAME_ACTOR analog: distinct (frame, actor) presence. */
  val frameActors: DataFrame =
    ev.select($"frame_id", $"user_id".as("actor_id")).distinct()

  /** Distinct (frame, event_type, user) presences — input to co-occurrence. */
  val presences: DataFrame =
    ev.select($"frame_id", $"event_type", $"user_id").distinct()

  /** FRAME_INTERACTION analog: canonicalized co-occurring pairs per frame,
    * weight = number of shared event types in the frame. */
  val frameInteractions: DataFrame = {
    val p1 = presences.select($"frame_id", $"event_type", $"user_id".as("u1"))
    val p2 = presences.select($"frame_id", $"event_type", $"user_id".as("u2"))
    p1.join(p2, Seq("frame_id", "event_type"))
      .filter($"u1" < $"u2")
      .groupBy($"frame_id", $"u1".as("actor1"), $"u2".as("actor2"))
      .agg(count(lit(1)).as("weight"))
  }

  /** INTERACTION analog: run-wide deduplicated undirected edges. */
  val interactions: DataFrame =
    frameInteractions.select($"actor1", $"actor2").distinct()

  // ---- deterministic probe entities (FIXTURES.md §4: computed, never hard-coded) ----

  /** The busiest frame (most distinct actors; ties → lowest id) — analog of
    * the reference's probe frame 8084 (`cypher_query_timing.py:36-48`). */
  val probeFrame: DataFrame = frameActors
    .groupBy($"frame_id").agg(count(lit(1)).as("c"))
    .orderBy(desc("c"), $"frame_id").limit(1)
    .select($"frame_id".as("pf"))

  /** Most active actor by event count (analog of probe actor 1138). */
  val probeActor1: DataFrame = ev
    .groupBy($"user_id").agg(count(lit(1)).as("c"))
    .orderBy(desc("c"), $"user_id").limit(1)
    .select($"user_id".as("pa1"))

  /** Second most active actor (analog of probe actor 1146). */
  val probeActor2: DataFrame = ev
    .groupBy($"user_id").agg(count(lit(1)).as("c"))
    .orderBy(desc("c"), $"user_id").limit(2).offset(1)
    .select($"user_id".as("pa2"))

  /** Busiest day by interaction rows (analog of the reference's day=7 in Q8). */
  val probeDay: DataFrame = frameInteractions
    .join(frames, "frame_id")
    .groupBy($"day").agg(count(lit(1)).as("c"))
    .orderBy(desc("c"), $"day").limit(1)
    .select($"day".as("pd"))

  /** Busiest full (year, month, day) date by interaction rows — anchors c01's
    * range-scan window (the reference hard-codes its 2009-07-01 scan window,
    * `cypher_query_timing.py:120`; deriving the anchor keeps the query
    * non-degenerate on any corpus span). */
  val probeDate: DataFrame = frameInteractions
    .join(frames, "frame_id")
    .groupBy($"year", $"month", $"day").agg(count(lit(1)).as("c"))
    .orderBy(desc("c"), $"year", $"month", $"day").limit(1)
    .select($"year".as("py"), $"month".as("pm"), $"day".as("pdd"))

  /** Busiest (day, hour) by interaction rows (analog of day=29, hour=10 in Q11). */
  val probeDayHour: DataFrame = frameInteractions
    .join(frames, "frame_id")
    .groupBy($"day", $"hour").agg(count(lit(1)).as("c"))
    .orderBy(desc("c"), $"day", $"hour").limit(1)
    .select($"day".as("pd"), $"hour".as("ph"))
}

object EventGraph {
  /** Frame length Δ in seconds. The reference defaults to 20 s for conference
    * contact data (`load_gexf_to_neo4j.py:45-46`); the driver's events table
    * spans a month at ~individual-minutes granularity, so one hour keeps the
    * frame grid in the low thousands at every scale factor. */
  val DeltaSeconds = 3600L

  def apply(spark: SparkSession, dir: String): EventGraph = new EventGraph(spark, dir)
}
