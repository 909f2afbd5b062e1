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
  * purchases still inside some live window. */
final case class FunnelBuffer(
    v1Ms: Array[Long], v1Ids: Array[Long],
    v2Ms: Array[Long], v2Ids: Array[Long], v2ClkMs: Array[Long], v2ClkIds: Array[Long],
    clkMs: Array[Long], clkIds: Array[Long],
    purMs: Array[Long], purIds: Array[Long])

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
  *
  * State is PROVABLY bounded by the window + lateness horizon: a pending
  * stage has `deadline > wm`, so its anchor is `> wm − window`, and any
  * candidate it can still use is `≥ anchor > wm − window` — everything at
  * or below `wm − window` is dead and evicted every trigger. No per-key
  * standing state remains once a key goes quiet (unlike StreamingAsOf's
  * retained latest right, the funnel's windows expire).
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
    val winMs = windowSec * 1000L
    events
      .withWatermark("ts", watermark)
      .select($"user_id".as[Long], $"ts".as[Timestamp],
        $"event_id".as[Long], $"kind".as[Int])
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelBuffer, FunnelStep](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        process(winMs))
  }

  private def empty = FunnelBuffer(Array.empty, Array.empty, Array.empty,
    Array.empty, Array.empty, Array.empty, Array.empty, Array.empty,
    Array.empty, Array.empty)

  /** Earliest candidate in `[from, from + win]`: (ts, id) or None. */
  private def earliest(cands: Array[(Long, Long)], from: Long,
      winMs: Long): Option[(Long, Long)] = {
    val in = cands.filter(c => c._1 >= from && c._1 <= from + winMs)
    if (in.isEmpty) None else Some(in.minBy(identity))
  }

  private def process(winMs: Long)(
      userId: Long,
      events: Iterator[(Long, Timestamp, Long, Int)],
      state: GroupState[FunnelBuffer]): Iterator[FunnelStep] = {
    val prev = state.getOption.getOrElse(empty)
    var v1 = prev.v1Ms.zip(prev.v1Ids)
    var v2 = prev.v2Ms.indices.toArray.map(i =>
      (prev.v2Ms(i), prev.v2Ids(i), prev.v2ClkMs(i), prev.v2ClkIds(i)))
    var clicks = prev.clkMs.zip(prev.clkIds)
    var purchases = prev.purMs.zip(prev.purIds)
    events.foreach { case (_, ts, id, kind) =>
      kind match {
        case View => v1 :+= (ts.getTime, id)
        case Click => clicks :+= (ts.getTime, id)
        case _ => purchases :+= (ts.getTime, id)
      }
    }
    val wm = state.getCurrentWatermarkMs()
    val out = Array.newBuilder[FunnelStep]

    // stage 1: a view resolves when its earliest in-window click is safely
    // final (wm past it) or the window has expired with no candidate
    val v1Kept = Array.newBuilder[(Long, Long)]
    v1.sortBy(identity).foreach { case (vms, vid) =>
      earliest(clicks, vms, winMs) match {
        case Some((cms, cid)) if wm > cms =>
          v2 :+= (vms, vid, cms, cid)
        case None if wm > vms + winMs =>
          out += FunnelStep(userId, vid, new Timestamp(vms), None, None, 0)
        case _ => v1Kept += ((vms, vid)) // still undecidable — wait
      }
    }
    v1 = v1Kept.result()

    // stage 2: same resolution against purchases, anchored at the click
    val v2Kept = Array.newBuilder[(Long, Long, Long, Long)]
    v2.sortBy(identity).foreach { case (vms, vid, cms, cid) =>
      earliest(purchases, cms, winMs) match {
        case Some((pms, pid)) if wm > pms =>
          out += FunnelStep(userId, vid, new Timestamp(vms),
            Some(cid), Some(pid), 2)
        case None if wm > cms + winMs =>
          out += FunnelStep(userId, vid, new Timestamp(vms), Some(cid), None, 1)
        case _ => v2Kept += ((vms, vid, cms, cid))
      }
    }
    v2 = v2Kept.result()

    // eviction: any live stage's anchor is > wm - window (its deadline is
    // still ahead of the watermark), so candidates at or below wm - window
    // can never be used again
    clicks = clicks.filter(_._1 > wm - winMs)
    purchases = purchases.filter(_._1 > wm - winMs)

    if (v1.isEmpty && v2.isEmpty && clicks.isEmpty && purchases.isEmpty) {
      state.remove()
    } else {
      state.update(FunnelBuffer(
        v1.map(_._1), v1.map(_._2),
        v2.map(_._1), v2.map(_._2), v2.map(_._3), v2.map(_._4),
        clicks.map(_._1), clicks.map(_._2),
        purchases.map(_._1), purchases.map(_._2)))
      // wake at the earliest moment more work can resolve: a pending
      // candidate maturing or a stage deadline expiring
      val wakes =
        v1.flatMap { case (vms, _) =>
          earliest(clicks, vms, winMs).map(_._1).toSeq :+ (vms + winMs) } ++
        v2.flatMap { case (_, _, cms, _) =>
          earliest(purchases, cms, winMs).map(_._1).toSeq :+ (cms + winMs) }
      if (wakes.nonEmpty)
        state.setTimeoutTimestamp(math.max(wakes.min + 1, wm + 1))
    }
    out.result().iterator
  }
}
