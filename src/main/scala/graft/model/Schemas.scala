package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** Core table model of the engine (SURVEY.md §1.3, FIXTURES.md §2).
  *
  * The reference (SocioPatterns/neo4j-dynagraph) reifies a dynamic graph as a
  * Neo4j property graph: FRAME/ACTOR/INTERACTION hypernodes plus a hand-built
  * year→month→day→hour timeline tree (reference `load_gexf_to_neo4j.py:102-142`,
  * `StructuredTimeline.java:36-59`). In Spark the same information is five flat
  * columnar tables; the timeline tree collapses into derived date-part columns +
  * Parquet partition pruning.
  *
  * Field names are the physical column names (snake_case) so the case classes
  * double as `Dataset[T]` encoders over the at-rest tables
  * ([[graft.build.DynamicGraph]] typed accessors); the `StructType`s are the
  * explicit read schemas — no inference, and partition-directory values parse
  * straight to the declared BIGINT types.
  *
  * All timestamps are UTC; epoch arithmetic is in whole seconds (the reference
  * uses integer POSIX seconds — `load_gexf_to_neo4j.py:8-9`).
  */

/** A validity interval of a node or edge, as parsed from dynamic GEXF
  * (reference `load_gexf_to_neo4j.py:61-98`). `kind` is "node" or "edge";
  * for nodes `dst` is null. `[t1, t2)` in POSIX seconds. */
final case class Spell(kind: String, src: Long, dst: Option[Long], t1: Long, t2: Long)

/** One fixed-Δ time slot. Dense: every grid slot in `[start, stop)` exists,
  * including empty ones (reference `load_gexf_to_neo4j.py:170`). Date parts are
  * denormalized UTC decompositions (reference `load_gexf_to_neo4j.py:137-142`). */
final case class Frame(
    frame_id: Long,
    ts_start: Timestamp,
    ts_end: Timestamp,
    length: Long,
    year: Long,
    month: Long,
    day: Long,
    hour: Long,
    minute: Long,
    second: Long)

final case class Actor(actor_id: Long, name: String)

/** Canonicalized undirected edge: invariant `actor1 < actor2`
  * (reference `load_gexf_to_neo4j.py:201-204`). */
final case class Interaction(actor1: Long, actor2: Long)

/** Frame-membership row (core model; the at-rest layout additionally carries
  * denormalized `hour` + date partition columns — SURVEY §4). */
final case class FrameActor(frame_id: Long, actor_id: Long)

/** Frame-scoped edge occurrence with aggregated contact weight
  * (reference `load_gexf_to_neo4j.py:240-250`). */
final case class FrameInteraction(frame_id: Long, actor1: Long, actor2: Long, weight: Long)

object Schemas {
  val spell: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("src", LongType, nullable = false),
    StructField("dst", LongType, nullable = true),
    StructField("t1", LongType, nullable = false),
    StructField("t2", LongType, nullable = false)))

  /** At-rest `frames` (year/month/day are the partition directories). */
  val frame: StructType = StructType(Seq(
    StructField("frame_id", LongType),
    StructField("ts_start", TimestampType),
    StructField("ts_end", TimestampType),
    StructField("length", LongType),
    StructField("hour", LongType),
    StructField("minute", LongType),
    StructField("second", LongType),
    StructField("year", LongType),
    StructField("month", LongType),
    StructField("day", LongType)))

  val actor: StructType = StructType(Seq(
    StructField("actor_id", LongType),
    StructField("name", StringType)))

  val interaction: StructType = StructType(Seq(
    StructField("actor1", LongType),
    StructField("actor2", LongType)))

  val frameActor: StructType = StructType(Seq(
    StructField("frame_id", LongType),
    StructField("actor_id", LongType)))

  val frameInteraction: StructType = StructType(Seq(
    StructField("frame_id", LongType),
    StructField("actor1", LongType),
    StructField("actor2", LongType),
    StructField("weight", LongType)))

  private val atRestExtras = Seq(
    StructField("hour", LongType),
    StructField("year", LongType),
    StructField("month", LongType),
    StructField("day", LongType))

  /** At-rest membership layouts: core columns + denormalized hour + the
    * (year, month, day) partition columns. */
  val frameActorAtRest: StructType = StructType(frameActor.fields ++ atRestExtras)
  val frameInteractionAtRest: StructType = StructType(frameInteraction.fields ++ atRestExtras)
}
