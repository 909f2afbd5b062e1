package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One resolved funnel entry: the view, its matched click/purchase (earliest
  * within each stage's conversion window), and the depth reached (0/1/2). */
final case class FunnelStep(
    user_id: Long,
    view_id: Long,
    view_ts: Timestamp,
    click_id: Option[Long],
    purchase_id: Option[Long],
    depth: Int)

/** Per-key funnel state, array-encoded: stage-1 pending views, stage-2
  * pending (view, click) anchors, and the buffered candidate clicks /
  * purchases still inside some live window. Times are MICROSECONDS since
  * epoch — the same unit the batch as-of family (a06/a07) resolves ties in,
  * so sub-millisecond events order identically on both paths. */
final case class FunnelBuffer(
    v1Us: Array[Long], v1Ids: Array[Long],
    v2Us: Array[Long], v2Ids: Array[Long], v2ClkUs: Array[Long], v2ClkIds: Array[Long],
    clkUs: Array[Long], clkIds: Array[Long],
    purUs: Array[Long], purIds: Array[Long])

/** Streaming 3-step funnel (view → click → purchase) with a per-stage
  * CONVERSION WINDOW — the streaming analog of the batch a07 composition,
  * windowed the way every production funnel is (an unbounded funnel is
  * undecidable on a stream: "this view never converts" is only knowable at
  * stream end; a window makes it decidable at `view.ts + window`).
  *
  * Semantics per view v: the matched click is the EARLIEST click in
  * `[v.ts, v.ts + window]` (ties → smallest id — the forward as-of rule);
  * the matched purchase is the earliest in `[click.ts, click.ts + window]`.
  * A stage resolves when the watermark passes the candidate (no earlier
  * event can still arrive) or passes the stage deadline with no candidate.
  * Event times are compared at microsecond precision (the batch family's
  * unit); only the engine watermark is millisecond-granular, which can delay
  * — never change — a resolution.
  *
  * State is PROVABLY bounded by the window + lateness horizon: a pending
  * stage has `deadline > wm`, so its anchor is `> wm − window`, and any
  * candidate it can still use is `≥ anchor > wm − window` — everything at
  * or below `wm − window` is dead and evicted every trigger. A timeout is
  * registered WHENEVER state is kept — including a quiet key holding only
  * unclaimed candidates (a click with no view) — so eviction always gets a
  * trigger and `state.remove()` is eventually reached for every key.
  */
object StreamingFunnel {

  /** Event kinds in the tagged input stream. */
  val View = 0; val Click = 1; val Purchase = 2

  /** `events` must be a streaming DataFrame with columns
    * (`user_id`, `ts`, `event_id`, `kind`) — kind ∈ [[View]]/[[Click]]/
    * [[Purchase]]; `watermark` bounds accepted lateness; `windowSec` is the
    * per-stage conversion window in seconds. */
  def funnel(events: DataFrame, watermark: String,
      windowSec: Long): Dataset[FunnelStep] = {
    val spark = events.sparkSession
    import spark.implicits._
    val winUs = windowSec * 1000000L
    events
      .withWatermark("ts", watermark)
      .select($"user_id".as[Long], $"ts".as[Timestamp],
        $"event_id".as[Long], $"kind".as[Int])
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelBuffer, FunnelStep](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        process(winUs))
  }

  private def empty = FunnelBuffer(Array.empty, Array.empty, Array.empty,
    Array.empty, Array.empty, Array.empty, Array.empty, Array.empty,
    Array.empty, Array.empty)

  import EventTimeUs.{usOf, tsOf}

  /** Earliest candidate in `[from, from + win]`: (us, id) or None. */
  private def earliest(cands: Array[(Long, Long)], from: Long,
      winUs: Long): Option[(Long, Long)] = {
    val in = cands.filter(c => c._1 >= from && c._1 <= from + winUs)
    if (in.isEmpty) None else Some(in.minBy(identity))
  }

  private def process(winUs: Long)(
      userId: Long,
      events: Iterator[(Long, Timestamp, Long, Int)],
      state: GroupState[FunnelBuffer]): Iterator[FunnelStep] = {
    val prev = state.getOption.getOrElse(empty)
    var v1 = prev.v1Us.zip(prev.v1Ids)
    var v2 = prev.v2Us.indices.toArray.map(i =>
      (prev.v2Us(i), prev.v2Ids(i), prev.v2ClkUs(i), prev.v2ClkIds(i)))
    var clicks = prev.clkUs.zip(prev.clkIds)
    var purchases = prev.purUs.zip(prev.purIds)
    events.foreach { case (_, ts, id, kind) =>
      kind match {
        case View => v1 :+= (usOf(ts), id)
        case Click => clicks :+= (usOf(ts), id)
        case _ => purchases :+= (usOf(ts), id)
      }
    }
    val wm = state.getCurrentWatermarkMs()
    val wmUs = wm * 1000L
    val out = Array.newBuilder[FunnelStep]

    // stage 1: a view resolves when its earliest in-window click is safely
    // final (wm past it) or the window has expired with no candidate
    val v1Kept = Array.newBuilder[(Long, Long)]
    v1.sortBy(identity).foreach { case (vus, vid) =>
      earliest(clicks, vus, winUs) match {
        case Some((cus, cid)) if wmUs > cus =>
          v2 :+= (vus, vid, cus, cid)
        case None if wmUs > vus + winUs =>
          out += FunnelStep(userId, vid, tsOf(vus), None, None, 0)
        case _ => v1Kept += ((vus, vid)) // still undecidable — wait
      }
    }
    v1 = v1Kept.result()

    // stage 2: same resolution against purchases, anchored at the click
    val v2Kept = Array.newBuilder[(Long, Long, Long, Long)]
    v2.sortBy(identity).foreach { case (vus, vid, cus, cid) =>
      earliest(purchases, cus, winUs) match {
        case Some((pus, pid)) if wmUs > pus =>
          out += FunnelStep(userId, vid, tsOf(vus), Some(cid), Some(pid), 2)
        case None if wmUs > cus + winUs =>
          out += FunnelStep(userId, vid, tsOf(vus), Some(cid), None, 1)
        case _ => v2Kept += ((vus, vid, cus, cid))
      }
    }
    v2 = v2Kept.result()

    // eviction: any live stage's anchor is > wm - window (its deadline is
    // still ahead of the watermark), so candidates at or below wm - window
    // can never be used again
    clicks = clicks.filter(_._1 > wmUs - winUs)
    purchases = purchases.filter(_._1 > wmUs - winUs)

    if (v1.isEmpty && v2.isEmpty && clicks.isEmpty && purchases.isEmpty) {
      state.remove()
    } else {
      state.update(FunnelBuffer(
        v1.map(_._1), v1.map(_._2),
        v2.map(_._1), v2.map(_._2), v2.map(_._3), v2.map(_._4),
        clicks.map(_._1), clicks.map(_._2),
        purchases.map(_._1), purchases.map(_._2)))
      // wake at the earliest moment more work can resolve: a pending
      // candidate maturing or a stage deadline expiring. With NO pending
      // stage, only unclaimed candidates remain — wake when the LAST of
      // them leaves the lateness horizon, at which point the eviction
      // filter drains the buffers and state.remove() fires. Either way a
      // timeout is always registered while state exists: no quiet-key leak.
      val wakesUs =
        v1.flatMap { case (vus, _) =>
          earliest(clicks, vus, winUs).map(_._1).toSeq :+ (vus + winUs) } ++
        v2.flatMap { case (_, _, cus, _) =>
          earliest(purchases, cus, winUs).map(_._1).toSeq :+ (cus + winUs) }
      val wakeUs =
        if (wakesUs.nonEmpty) wakesUs.min
        else (clicks ++ purchases).map(_._1 + winUs).max
      state.setTimeoutTimestamp(EventTimeUs.timeoutMs(wakeUs, wm))
    }
    out.result().iterator
  }
}
