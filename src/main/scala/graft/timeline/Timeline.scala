package graft.timeline

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's timeline-index API (SURVEY.md §2.D, `BaseTimeline.java` /
  * `StructuredTimeline.java`) re-expressed as predicate builders over a
  * timestamp-keyed DataFrame.
  *
  * The reference maintains a sorted circular linked list of time nodes plus a
  * year→month→day→hour tree to give Neo4j point/range access paths. On Spark
  * the payload table IS the index: a pushed-down timestamp predicate over
  * Parquet partitioned by (year, month, day) and sorted by timestamp does the
  * tree descent (partition pruning) and the list scan (row-group min/max
  * skipping) — see SURVEY.md §3.3. So every method here just builds the
  * filter; Catalyst turns it into the pruned scan.
  *
  * Faithful semantics:
  *  - range bounds are EXCLUSIVE on both ends, as in the reference
  *    (`BaseTimeline.java:551,614,658,678`);
  *  - `allBetween` rejects from >= to (`BaseTimeline.java:637-641`);
  *  - `nodes(after, before)` dispatches on null-ness (`BaseTimeline.java:417-439`);
  *  - first/last are min/max aggregates (`BaseTimeline.java:138-170`).
  */
final class Timeline(val payload: DataFrame, val tsCol: String,
    val storagePath: Option[String] = None) {
  private def ts: Column = col(tsCol)

  /** D11: `getTimestampForNode` (`BaseTimeline.java:291-330`) — reverse
    * payload→timestamp lookup. The reference walks TIMELINE_INSTANCE
    * relationships; here rows carry their timestamp natively, so this is a
    * filter + projection. */
  def timestampFor(pred: Column): DataFrame =
    payload.filter(pred).select(ts.as("timestamp"))

  /** D3/D4: point lookup (reference `BaseTimeline.java:481-519`). */
  def nodesAt(epochSeconds: Long): DataFrame =
    payload.filter(ts === timestamp_seconds(lit(epochSeconds)))
  def nodesAt(at: Column): DataFrame = payload.filter(ts === at)

  /** D5: full ordered scan (`BaseTimeline.java:441-461`). */
  def allNodes: DataFrame = payload.orderBy(ts)

  /** D6: strictly-after range scan (`BaseTimeline.java:521-563`). */
  def allAfter(epochSeconds: Long): DataFrame =
    payload.filter(ts > timestamp_seconds(lit(epochSeconds)))
  def allAfter(after: Column): DataFrame = payload.filter(ts > after)

  /** D7: strictly-before range scan (`BaseTimeline.java:602-632`). */
  def allBefore(epochSeconds: Long): DataFrame =
    payload.filter(ts < timestamp_seconds(lit(epochSeconds)))
  def allBefore(before: Column): DataFrame = payload.filter(ts < before)

  /** D8: exclusive-both-ends range scan (`BaseTimeline.java:634-690`). */
  def allBetween(fromEpochSeconds: Long, toEpochSeconds: Long): DataFrame = {
    require(fromEpochSeconds < toEpochSeconds,
      s"Start time $fromEpochSeconds not before end time $toEpochSeconds")
    payload.filter(
      ts > timestamp_seconds(lit(fromEpochSeconds)) &&
      ts < timestamp_seconds(lit(toEpochSeconds)))
  }
  def allBetween(from: Column, to: Column): DataFrame =
    payload.filter(ts > from && ts < to)

  /** D9: optional-bound dispatch (`BaseTimeline.java:417-439`). */
  def nodes(afterOrNull: Option[Long], beforeOrNull: Option[Long]): DataFrame =
    (afterOrNull, beforeOrNull) match {
      case (None, None) => allNodes
      case (Some(a), None) => allAfter(a)
      case (None, Some(b)) => allBefore(b)
      case (Some(a), Some(b)) => allBetween(a, b)
    }

  /** D10: first/last timestamps, O(1) from scan metadata (`BaseTimeline.java:138-170`). */
  def firstLast: DataFrame =
    payload.agg(min(ts).as("first_ts"), max(ts).as("last_ts"), count(lit(1)).as("n_nodes"))

  /** D12: `removeNode` (`BaseTimeline.java:332-415`) as immutable-snapshot
    * deletion: drop the payload rows matching the predicate and return the
    * new timeline. The reference's "delete the time node and relink the list
    * when its last instance goes" is inherent here — a timestamp with no
    * remaining rows simply no longer exists in the filtered relation; no
    * pointer surgery. Persist the snapshot with [[rewrite]] to make the
    * deletion durable (filter + rewrite, the columnar-storage deletion
    * idiom). */
  def removeNodes(pred: Column): Timeline =
    // three-valued logic: only rows where pred is definitively TRUE are
    // removed; a NULL predicate keeps the row (coalesce, not bare negation)
    new Timeline(payload.filter(!coalesce(pred, lit(false))), tsCol)

  /** D12 point form: drop every node at exactly this timestamp. */
  def removeAt(epochSeconds: Long): Timeline =
    removeNodes(ts === timestamp_seconds(lit(epochSeconds)))

  /** Persist this timeline's payload as a new at-rest snapshot (sorted by
    * timestamp, the layout [[graft.build.GraphBuilder.write]] uses). The
    * returned timeline remembers its path, so a catalog delete can drop the
    * data (D13). */
  def rewrite(path: String): Timeline = {
    payload.sortWithinPartitions(ts).write
      .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)
    new Timeline(payload.sparkSession.read.parquet(path), tsCol, Some(path))
  }
}

object Timeline {
  def apply(payload: DataFrame, tsCol: String = "ts_start"): Timeline =
    new Timeline(payload, tsCol)
}

/** D14/E1: named-timeline catalog with the reference's identity guard —
  * binding an existing name to a different payload throws, mirroring
  * `assertPropertyIsSame` (`BaseTimeline.java:98,108-126`). */
final class TimelineCatalog {
  private val timelines = new ConcurrentHashMap[String, Timeline]()

  def create(name: String, payload: DataFrame, tsCol: String = "ts_start"): Timeline =
    bind(name, new Timeline(payload, tsCol))

  /** Bind an existing timeline (keeps its at-rest storage path, so
    * `delete(name, dropData = true)` can reach the files). */
  def bind(name: String, timeline: Timeline): Timeline = {
    val existing = timelines.putIfAbsent(name, timeline)
    if (existing == null) timeline
    else if (existing.payload eq timeline.payload) existing
    else throw new IllegalArgumentException(
      s"The timeline name '$name' is already bound to a different payload")
  }

  def get(name: String): Option[Timeline] = Option(timelines.get(name))

  /** D13: drop the timeline (`BaseTimeline.java:692-732`): unbind the name
    * and, when `dropData` and the timeline owns an at-rest snapshot
    * ([[Timeline.rewrite]]), delete its files too — the full analog of the
    * reference's relationship-unlinking delete loop. */
  def delete(name: String, dropData: Boolean = false): Unit = {
    val removed = timelines.remove(name)
    if (dropData && removed != null) removed.storagePath.foreach { p =>
      import scala.jdk.CollectionConverters._
      val root = java.nio.file.Paths.get(p)
      if (java.nio.file.Files.exists(root)) {
        val stream = java.nio.file.Files.walk(root)
        try stream.iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
        finally stream.close()
      }
    }
  }
}
