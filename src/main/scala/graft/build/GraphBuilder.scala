package graft.build

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{Actor, Frame, FrameActor, FrameInteraction, Interaction, Schemas, Spell}

/** The five derived tables of the engine's core model (SURVEY.md §1.3).
  * Untyped `DataFrame`s internally (Catalyst sees column-level lineage);
  * typed `Dataset[T]` views for the library API surface. */
final case class DynamicGraph(
    frames: DataFrame,
    actors: DataFrame,
    interactions: DataFrame,
    frameActors: DataFrame,
    frameInteractions: DataFrame) {

  def typedFrames: Dataset[Frame] = {
    val s = frames.sparkSession; import s.implicits._
    frames.select("frame_id", "ts_start", "ts_end", "length", "year", "month",
      "day", "hour", "minute", "second").as[Frame]
  }
  def typedActors: Dataset[Actor] = {
    val s = actors.sparkSession; import s.implicits._
    actors.as[Actor]
  }
  def typedInteractions: Dataset[Interaction] = {
    val s = interactions.sparkSession; import s.implicits._
    interactions.as[Interaction]
  }
  def typedFrameActors: Dataset[FrameActor] = {
    val s = frameActors.sparkSession; import s.implicits._
    frameActors.select("frame_id", "actor_id").as[FrameActor]
  }
  def typedFrameInteractions: Dataset[FrameInteraction] = {
    val s = frameInteractions.sparkSession; import s.implicits._
    frameInteractions.select("frame_id", "actor1", "actor2", "weight").as[FrameInteraction]
  }
}

/** Batch graph construction from spell streams (SURVEY.md §2.B, the loader
  * dataflow of reference `load_gexf_to_neo4j.py:61-250`), Spark-first:
  *
  *  - B1 interval discretization: snap `[t1,t2)` to the Δ-grid anchored at
  *    START_TIME (`load_gexf_to_neo4j.py:69-71`) via `sequence` + `explode` —
  *    pure codegen'd Catalyst expressions, no driver loop;
  *  - B2 activity sets: exploded + `distinct` (set semantics of
  *    `load_gexf_to_neo4j.py:73-93`);
  *  - B3 canonicalization: `least/greatest` + distinct (`:201-204`);
  *  - B4 dense frames incl. empty slots (`:95-98,170`) via `spark.range`
  *    (unbounded spans stream from the range source — no driver-side list);
  *  - B5 UTC date-part denormalization (`:104-142`, minus its localtime bug);
  *  - B6 frame-membership joins.
  *
  * Scale: the exploded spell table is the only data-proportional structure;
  * it shuffles once per `distinct` on (frame, key) and the write is
  * partitioned by (year, month, day) + sorted by ts_start within partitions,
  * which IS the reference's timeline tree + sorted list at rest (SURVEY §4):
  * Catalyst partition pruning = tree descent, row-group min/max = list scan.
  */
object GraphBuilder {

  /** Build the five tables from node/edge spells.
    *
    * @param delta frame length Δ in seconds (reference default 20 s)
    * @param startTime grid origin; defaults to min(t1) over all spells
    */
  def fromSpells(spark: SparkSession, spells: Dataset[Spell], delta: Long,
      startTime: Option[Long] = None): DynamicGraph = {
    import spark.implicits._

    val live = spells.filter($"t2" > $"t1").cache()
    val boundsRow = live.agg(
      min($"t1").as("tmin"), max($"t2").as("tmax")).first()
    val start = startTime.getOrElse(boundsRow.getLong(0))
    val stop = boundsRow.getLong(1)
    val nFrames = (stop - start + delta - 1) / delta

    // B1: one row per covered frame slot. Grid start per spell:
    // t1 - ((t1 - START) mod Δ); covered slots = sequence(grid, t2-1, Δ).
    val exploded = live
      .withColumn("grid", $"t1" - pmod($"t1" - lit(start), lit(delta)))
      .withColumn("slot_ts", explode(sequence($"grid", $"t2" - 1, lit(delta))))
      .withColumn("frame_id", (($"slot_ts" - lit(start)) / delta).cast("long"))
      .filter($"frame_id" >= 0 && $"frame_id" < nFrames)

    // B4 + B5: dense frame table with UTC decomposition.
    val frames = spark.range(0, nFrames).toDF("frame_id")
      .withColumn("ts_start", timestamp_seconds(lit(start) + $"frame_id" * delta))
      .withColumn("ts_end", timestamp_seconds(lit(start) + ($"frame_id" + 1) * delta))
      .select(
        $"frame_id", $"ts_start", $"ts_end", lit(delta).as("length"),
        year($"ts_start").cast("long").as("year"),
        month($"ts_start").cast("long").as("month"),
        dayofmonth($"ts_start").cast("long").as("day"),
        hour($"ts_start").cast("long").as("hour"),
        minute($"ts_start").cast("long").as("minute"),
        second($"ts_start").cast("long").as("second"))

    val nodeSlots = exploded.filter($"kind" === "node")
    val edgeSlots = exploded.filter($"kind" === "edge")
      .select($"frame_id",
        least($"src", $"dst").as("actor1"),
        greatest($"src", $"dst").as("actor2"))

    val actors = nodeSlots.select($"src".as("actor_id")).distinct()
      .withColumn("name", concat(lit("ACTOR_"), lpad($"actor_id".cast("string"), 4, "0")))

    // B2/B6: set-semantics memberships.
    val frameActors = nodeSlots.select($"frame_id", $"src".as("actor_id")).distinct()

    // Reference sets weight=1 per (frame, interaction) contact link
    // (`load_gexf_to_neo4j.py:248`); duplicates collapse via distinct.
    val frameInteractions = edgeSlots.distinct()
      .withColumn("weight", lit(1L))

    // B3: run-wide deduplicated undirected edge catalog.
    val interactions = frameInteractions.select($"actor1", $"actor2").distinct()

    DynamicGraph(frames, actors, interactions, frameActors, frameInteractions)
  }

  /** Persist the graph: frames/memberships partitioned by date, one file per
    * day, sorted by frame within partitions — the at-rest layout that
    * replaces the reference's timeline index (SURVEY.md §4): partition
    * pruning = tree descent, row-group min/max on the sorted frame_id = the
    * sorted-list scan. Memberships also denormalize `hour`, so an
    * hour-windowed query (reference Q11) is a pruned scan + pushed filter
    * with no frames join at all. */
  def write(g: DynamicGraph, path: String, mode: SaveMode = SaveMode.Overwrite): Unit = {
    val pcols = Seq(col("year"), col("month"), col("day"))
    g.frames.repartition(pcols: _*).sortWithinPartitions("frame_id")
      .write.mode(mode).partitionBy("year", "month", "day")
      .parquet(s"$path/frames")
    g.actors.write.mode(mode).parquet(s"$path/actors")
    g.interactions.write.mode(mode).parquet(s"$path/interactions")
    val byDate = g.frames.select("frame_id", "year", "month", "day", "hour")
    g.frameActors.join(byDate, "frame_id")
      .repartition(pcols: _*).sortWithinPartitions("frame_id")
      .write.mode(mode).partitionBy("year", "month", "day")
      .parquet(s"$path/frame_actors")
    g.frameInteractions.join(byDate, "frame_id")
      .repartition(pcols: _*).sortWithinPartitions("frame_id")
      .write.mode(mode).partitionBy("year", "month", "day")
      .parquet(s"$path/frame_interactions")
  }

  /** Read back the at-rest layout with the declared model schemas
    * (`graft.model.Schemas`): no footer/partition-type inference, and the
    * (year, month, day) partition directories parse directly to the model's
    * BIGINT — partition pruning operates on native values, no casts in the
    * plan. */
  def read(spark: SparkSession, path: String): DynamicGraph = DynamicGraph(
    frames = spark.read.schema(Schemas.frame).parquet(s"$path/frames"),
    actors = spark.read.schema(Schemas.actor).parquet(s"$path/actors"),
    interactions = spark.read.schema(Schemas.interaction).parquet(s"$path/interactions"),
    frameActors = spark.read.schema(Schemas.frameActorAtRest).parquet(s"$path/frame_actors"),
    frameInteractions =
      spark.read.schema(Schemas.frameInteractionAtRest).parquet(s"$path/frame_interactions"))
}
