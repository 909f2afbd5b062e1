package graft.model

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
    frameId: Int,
    tsStart: java.sql.Timestamp,
    tsEnd: java.sql.Timestamp,
    length: Int,
    year: Int,
    month: Int,
    day: Int,
    hour: Int,
    minute: Int,
    second: Int)

final case class Actor(actorId: Long, name: String)

/** Canonicalized undirected edge: invariant `actor1 < actor2`
  * (reference `load_gexf_to_neo4j.py:201-204`). */
final case class Interaction(actor1: Long, actor2: Long)

final case class FrameActor(frameId: Int, actorId: Long)

/** Frame-scoped edge occurrence with aggregated contact weight
  * (reference `load_gexf_to_neo4j.py:240-250`). */
final case class FrameInteraction(frameId: Int, actor1: Long, actor2: Long, weight: Int)

object Schemas {
  val spell: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("src", LongType, nullable = false),
    StructField("dst", LongType, nullable = true),
    StructField("t1", LongType, nullable = false),
    StructField("t2", LongType, nullable = false)))

  val frame: StructType = StructType(Seq(
    StructField("frame_id", IntegerType, nullable = false),
    StructField("ts_start", TimestampType, nullable = false),
    StructField("ts_end", TimestampType, nullable = false),
    StructField("length", IntegerType, nullable = false),
    StructField("year", IntegerType, nullable = false),
    StructField("month", IntegerType, nullable = false),
    StructField("day", IntegerType, nullable = false),
    StructField("hour", IntegerType, nullable = false),
    StructField("minute", IntegerType, nullable = false),
    StructField("second", IntegerType, nullable = false)))

  val actor: StructType = StructType(Seq(
    StructField("actor_id", LongType, nullable = false),
    StructField("name", StringType, nullable = false)))

  val interaction: StructType = StructType(Seq(
    StructField("actor1", LongType, nullable = false),
    StructField("actor2", LongType, nullable = false)))

  val frameActor: StructType = StructType(Seq(
    StructField("frame_id", IntegerType, nullable = false),
    StructField("actor_id", LongType, nullable = false)))

  val frameInteraction: StructType = StructType(Seq(
    StructField("frame_id", IntegerType, nullable = false),
    StructField("actor1", LongType, nullable = false),
    StructField("actor2", LongType, nullable = false),
    StructField("weight", IntegerType, nullable = false)))
}
