package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.Fingerprint.fingerprintMd5

/** One dedup verdict: the document, whether it duplicates an earlier one
  * within the horizon, and the canonical (horizon-session-first) doc id. */
final case class DedupVerdict(
    doc_id: Long,
    ts: Timestamp,
    fp: String,
    is_dup: Boolean,
    canonical_id: Long)

/** Per-fingerprint state: the live horizon-session anchor (first doc of the
  * current session) + the last event time that extended it, and the pending
  * docs whose verdicts are not yet watermark-final. Times in MICROSECONDS
  * (the engine-wide event-time unit — see [[StreamingFunnel]]). */
final case class DedupBuffer(
    anchorId: Long, anchorLive: Boolean, lastUs: Long,
    pendUs: Array[Long], pendIds: Array[Long])

/** Streaming ingest-time exact dedup — the streaming analog of the batch
  * dd1 query, the operator a training pipeline runs WHILE data arrives
  * instead of re-scanning the corpus afterwards.
  *
  * Unbounded exact dedup is impossible on a stream (every fingerprint ever
  * seen would be standing state), so the decidable-and-bounded semantics is
  * HORIZON dedup: two equal-fingerprint docs are duplicates when they fall
  * in the same inactivity-gap session of their fingerprint group (gap >
  * `horizonSec` starts a new session — exactly a02's sessionization rule
  * applied per fingerprint). The canonical doc is the session's first
  * (earliest event time, ties → smallest id), which — unlike batch dd1's
  * global min id — is decidable the moment the watermark passes a doc's
  * timestamp. Verdicts are therefore emitted watermark-finally, in event-
  * time order per fingerprint.
  *
  * State is provably bounded: one (anchor, lastTs) pair per fingerprint
  * active inside the lateness+horizon window plus the not-yet-final pending
  * docs; a timeout is registered whenever state is kept (resolution wake for
  * pending docs, expiry wake `lastTs + horizon` for idle anchors), so every
  * fingerprint reaches `state.remove()` after going quiet — the
  * [[StreamingFunnel]] quiet-key discipline. */
object StreamingDedup {

  /** `docs` must be a streaming DataFrame with (`doc_id`, `ts`, `text`);
    * the fingerprint is dd1's md5 over whitespace-normalized lowercased
    * text, computed with the SAME shared expression. */
  def dedup(docs: DataFrame, watermark: String,
      horizonSec: Long): Dataset[DedupVerdict] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val horizonUs = horizonSec * 1000000L
    docs
      .withWatermark("ts", watermark)
      .select(col("doc_id").as[Long], col("ts").as[Timestamp],
        fingerprintMd5(col("text")).as("fp").as[String])
      .groupByKey(_._3)
      .flatMapGroupsWithState[DedupBuffer, DedupVerdict](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        process(horizonUs))
  }

  import EventTimeUs.{usOf, tsOf}

  private def process(horizonUs: Long)(
      fp: String,
      docs: Iterator[(Long, Timestamp, String)],
      state: GroupState[DedupBuffer]): Iterator[DedupVerdict] = {
    val prev = state.getOption.getOrElse(
      DedupBuffer(0L, anchorLive = false, 0L, Array.empty, Array.empty))
    var anchorId = prev.anchorId
    var anchorLive = prev.anchorLive
    var lastUs = prev.lastUs
    var pending = prev.pendUs.zip(prev.pendIds) ++
      docs.map { case (id, ts, _) => (usOf(ts), id) }
    val wm = state.getCurrentWatermarkMs()
    val wmUs = wm * 1000L
    val out = Array.newBuilder[DedupVerdict]

    // resolve watermark-final docs in event-time order: everything below
    // the watermark has arrived, so the (ts, id) order is the true one
    val (ripe, wait) = pending.partition(_._1 < wmUs)
    pending = wait
    ripe.sortBy(identity).foreach { case (us, id) =>
      val sameSession = anchorLive && us - lastUs <= horizonUs
      if (sameSession) {
        out += DedupVerdict(id, tsOf(us), fp, is_dup = true, anchorId)
        lastUs = math.max(lastUs, us)
      } else {
        anchorId = id; anchorLive = true; lastUs = us
        out += DedupVerdict(id, tsOf(us), fp, is_dup = false, id)
      }
    }
    // the anchor expires when no future doc can extend its session
    if (anchorLive && pending.isEmpty && wmUs > lastUs + horizonUs)
      anchorLive = false

    if (!anchorLive && pending.isEmpty) {
      state.remove()
    } else {
      state.update(DedupBuffer(anchorId, anchorLive, lastUs,
        pending.map(_._1), pending.map(_._2)))
      // always wake: earliest pending doc becoming final, else the anchor's
      // session expiry — no quiet-key leak
      val wakeUs =
        if (pending.nonEmpty) pending.map(_._1).min
        else lastUs + horizonUs
      state.setTimeoutTimestamp(EventTimeUs.timeoutMs(wakeUs, wm))
    }
    out.result().iterator
  }
}
