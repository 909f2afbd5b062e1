package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One enriched left event: the latest right event at-or-before it (None
  * when no right event precedes) — the streaming analog of
  * [[graft.operators.AsOf.joinBackward]]'s output row. */
final case class AsOfMatch(
    user_id: Long,
    event_id: Long,
    ts: Timestamp,
    asof_event_id: Option[Long],
    asof_ts: Option[Timestamp])

/** Per-key as-of state: pending left events not yet matured past the
  * watermark, and the right events still able to match a future left
  * (everything above the watermark plus the single latest at-or-below it). */
final case class AsOfBuffer(
    leftMs: Array[Long], leftIds: Array[Long],
    rightMs: Array[Long], rightIds: Array[Long])

/** Streaming backward as-of join (stream-stream latest-state enrichment) —
  * for each left event, the latest right event at-or-before it within the
  * same key, exactly the batch [[graft.operators.AsOf]] semantics (ties on
  * ts match; greatest right id wins equal timestamps).
  *
  * Structured Streaming's built-in stream-stream join can only produce ALL
  * right rows in a time bound, not the latest one (the post-join argmax is
  * not append-safe), so this is custom state: both sides union into one
  * keyed stream; a left event is emitted when the watermark passes its
  * timestamp — at that point no right event at-or-before it can still
  * arrive (later arrivals below the watermark are dropped by the engine) —
  * and it matches against the buffered right events.
  *
  * State per key is bounded by the lateness horizon for left events and for
  * unmatured right events, plus ONE retained latest right event per key (the
  * standing "current state" any future left event may match — O(keys), the
  * same bounded-catalog tradeoff as StreamingSessionizer's numbering).
  */
object StreamingAsOf {

  /** `left`/`right` must be streaming DataFrames with columns
    * (`user_id`, `ts`, `event_id`); `watermark` bounds accepted lateness. */
  def joinBackward(left: DataFrame, right: DataFrame,
      watermark: String): Dataset[AsOfMatch] = {
    val spark = left.sparkSession
    import spark.implicits._
    val cols = Seq("user_id", "ts", "event_id")
    val tagged = left.select(cols.map(col) :+ lit(1).as("is_left"): _*)
      .unionByName(right.select(cols.map(col) :+ lit(0).as("is_left"): _*))
    tagged
      .withWatermark("ts", watermark)
      .select($"user_id".as[Long], $"ts".as[Timestamp],
        $"event_id".as[Long], $"is_left".as[Int])
      .groupByKey(_._1)
      .flatMapGroupsWithState[AsOfBuffer, AsOfMatch](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(process)
  }

  private def process(
      userId: Long,
      events: Iterator[(Long, Timestamp, Long, Int)],
      state: GroupState[AsOfBuffer]): Iterator[AsOfMatch] = {
    val prev = state.getOption.getOrElse(
      AsOfBuffer(Array.empty, Array.empty, Array.empty, Array.empty))
    var lefts = prev.leftMs.zip(prev.leftIds)
    var rights = prev.rightMs.zip(prev.rightIds)
    events.foreach { case (_, ts, id, isLeft) =>
      if (isLeft == 1) lefts :+= (ts.getTime, id) else rights :+= (ts.getTime, id)
    }
    val wm = state.getCurrentWatermarkMs()

    // a left event matures once the watermark passes it strictly: no right
    // event at-or-before it can still arrive
    val (matured, pending) = lefts.partition(_._1 < wm)
    val out = matured.sortBy(l => (l._1, l._2)).map { case (lms, lid) =>
      val m = rights.filter(_._1 <= lms)
      val best = if (m.isEmpty) None else Some(m.maxBy(r => (r._1, r._2)))
      AsOfMatch(userId, lid, new Timestamp(lms),
        best.map(_._2), best.map(b => new Timestamp(b._1)))
    }

    // retain right events above the watermark plus the single latest at-or-
    // below it (the standing state future lefts may still match)
    val (fresh, old) = rights.partition(_._1 > wm)
    val keptRights = fresh ++ (if (old.isEmpty) Array.empty[(Long, Long)]
      else Array(old.maxBy(r => (r._1, r._2))))

    if (pending.isEmpty && keptRights.isEmpty) {
      // a key whose lefts all matured and that never saw a right has no
      // standing state to keep: retaining an all-empty buffer with no
      // timeout would leak it until query end (the quiet-key rule)
      state.remove()
    } else {
      state.update(AsOfBuffer(pending.map(_._1), pending.map(_._2),
        keptRights.map(_._1), keptRights.map(_._2)))
      if (pending.nonEmpty || fresh.nonEmpty) {
        // wake when the earliest pending work can mature (engine requires a
        // strictly-future event-time timeout); with ONLY the retained
        // latest right left behind, no timeout is set on purpose — that
        // row is the standing state future lefts match (class doc)
        val next = (pending.map(_._1) ++ fresh.map(_._1)).min + 1
        state.setTimeoutTimestamp(math.max(next, wm + 1))
      }
    }
    out.iterator
  }
}
