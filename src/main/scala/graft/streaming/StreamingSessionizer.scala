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
  * Scale: state per user = events within one gap-plus-lateness horizon (a
  * count and a timestamp array), evicted by timeout — bounded by activity
  * rate × horizon, never by stream length; keyed shuffle on user_id only.
  */
object StreamingSessionizer {

  /** `events` must be a streaming DataFrame with `ts` (event time) and
    * `user_id`; `watermark` bounds accepted lateness. */
  def sessionize(events: DataFrame, gapSec: Long, watermark: String): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .select(col("user_id").as[Long], col("ts").as[Timestamp])
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionBuffer, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(process(gapSec * 1000L))
  }

  private def process(gapMs: Long)(
      userId: Long,
      events: Iterator[(Long, Timestamp)],
      state: GroupState[SessionBuffer]): Iterator[ClosedSession] = {
    val prev = state.getOption.getOrElse(SessionBuffer(0L, Array.empty))
    if (state.hasTimedOut) {
      // watermark passed max(ts) + gap: nothing can extend or reorder the
      // buffered span — finalize it with the batch split
      val sessions = split(userId, prev.closedCount, prev.tsMs, gapMs)
      state.update(SessionBuffer(prev.closedCount + sessions.size, Array.empty))
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

  /** The batch a02 split: sort, break where the gap exceeds gapMs. */
  private def split(userId: Long, baseCount: Long, tsMs: Array[Long],
      gapMs: Long): Seq[ClosedSession] = {
    if (tsMs.isEmpty) return Seq.empty
    val sorted = tsMs.sorted
    val out = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
    var start = sorted.head
    var end = sorted.head
    var n = 1L
    def close(): Unit = out += ClosedSession(userId, baseCount + out.size + 1, n,
      new Timestamp(start), new Timestamp(end), (end - start) / 1000L)
    sorted.tail.foreach { t =>
      if (t - end > gapMs) { close(); start = t; end = t; n = 1L }
      else { end = t; n += 1L }
    }
    close()
    out.toSeq
  }
}
