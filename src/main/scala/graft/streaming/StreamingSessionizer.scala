package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A closed session, same contract as the batch `a02_sessionize` rollup. */
final case class ClosedSession(
    user_id: Long,
    session_id: Long,
    n_events: Long,
    ts_start: Timestamp,
    ts_end: Timestamp,
    dur_sec: Long)

/** Per-user sessionizer state: number of sessions already emitted (keeps
  * session_id numbering continuous across finalizations) + the event-time
  * buffer still inside the lateness horizon. */
final case class SessionBuffer(closedCount: Long, tsMs: Array[Long])

/** Streaming inactivity-gap sessionization — the custom-state Structured
  * Streaming operator (`flatMapGroupsWithState` + event-time timeout) the
  * window API can't express (session windows have data-dependent bounds).
  *
  * Semantics: EXACT batch parity within the watermark. Events buffer per
  * user (out-of-order arrivals inside the horizon just land in the buffer);
  * when the event-time timeout fires at `max(ts) + gap` — i.e. the watermark
  * proves no future event can extend or reorder the buffered span — the
  * buffer is sorted and split into sessions exactly like the batch
  * formulation (SessionQueries a02), all of them emitted and the per-user
  * session counter advanced. Events later than the watermark horizon are
  * dropped by the engine (the same documented bounded-lateness deviation as
  * StreamingGraphBuilder).
  *
  * Scale: the event buffer per user is bounded by activity rate × the
  * gap-plus-lateness horizon and is evicted at timeout; keyed shuffle on
  * user_id only. With the default `retainNumbering=true` a counter row per
  * user persists after finalization (state O(distinct users) — fine for
  * bounded user catalogs); `retainNumbering=false` removes state entirely
  * at finalization for unbounded-cardinality keys, at the cost of
  * session_id restarting per activity epoch.
  */
object StreamingSessionizer {

  /** `events` must be a streaming DataFrame with `ts` (event time) and
    * `user_id`; `watermark` bounds accepted lateness.
    *
    * @param retainNumbering state-size tradeoff: `true` (default) keeps one
    *   tiny counter row per user FOREVER so `session_id` numbering stays
    *   continuous across activity epochs — right when user cardinality is
    *   bounded (it is O(users), not O(events)). On unbounded-cardinality
    *   streams pass `false`: state is fully removed at finalization
    *   (bounded by the lateness horizon alone) and `session_id` restarts
    *   at 1 per activity epoch. */
  def sessionize(events: DataFrame, gapSec: Long, watermark: String,
      retainNumbering: Boolean = true): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .select(col("user_id").as[Long], col("ts").as[Timestamp])
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionBuffer, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        process(gapSec * 1000L, retainNumbering))
  }

  private def process(gapMs: Long, retainNumbering: Boolean)(
      userId: Long,
      events: Iterator[(Long, Timestamp)],
      state: GroupState[SessionBuffer]): Iterator[ClosedSession] = {
    val prev = state.getOption.getOrElse(SessionBuffer(0L, Array.empty))
    if (state.hasTimedOut) {
      // watermark passed max(ts) + gap: nothing can extend or reorder the
      // buffered span — finalize it with the batch split
      val sessions = split(userId, prev.closedCount, prev.tsMs, gapMs)
      if (retainNumbering)
        state.update(SessionBuffer(prev.closedCount + sessions.size, Array.empty))
      else state.remove()
      sessions.iterator
    } else {
      val buf = prev.tsMs ++ events.map(_._2.getTime)
      state.update(SessionBuffer(prev.closedCount, buf))
      if (buf.nonEmpty) {
        // strictly-future timeout: the engine rejects timestamps <= watermark
        val t = math.max(buf.max + gapMs, state.getCurrentWatermarkMs() + 1)
        state.setTimeoutTimestamp(t)
      }
      Iterator.empty
    }
  }

  /** The batch a02 split: sort, break where the gap exceeds the threshold.
    * Gap and duration use FLOOR-SECOND arithmetic (`unix_timestamp` /
    * `date_diff('second')` semantics), exactly like the batch formulation —
    * comparing raw millisecond deltas would disagree with batch on
    * sub-second timestamps. Timestamps themselves keep full precision. */
  private def split(userId: Long, baseCount: Long, tsMs: Array[Long],
      gapMs: Long): Seq[ClosedSession] = {
    if (tsMs.isEmpty) return Seq.empty
    val gapSec = gapMs / 1000L
    def sec(ms: Long): Long = Math.floorDiv(ms, 1000L)
    val sorted = tsMs.sorted
    val out = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
    var start = sorted.head
    var end = sorted.head
    var n = 1L
    def close(): Unit = out += ClosedSession(userId, baseCount + out.size + 1, n,
      new Timestamp(start), new Timestamp(end), sec(end) - sec(start))
    sorted.tail.foreach { t =>
      if (sec(t) - sec(end) > gapSec) { close(); start = t; end = t; n = 1L }
      else { end = t; n += 1L }
    }
    close()
    out.toSeq
  }
}
