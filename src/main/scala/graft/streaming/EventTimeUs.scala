package graft.streaming

import java.sql.Timestamp

/** Microsecond event-time arithmetic shared by every custom-state streaming
  * operator (funnel, dedup): ONE copy of the Timestamp↔µs conversions and
  * the event-time-timeout rounding, so a precision fix can never leave two
  * operators with silently divergent time semantics. Batch as-of parity
  * pins the µs granularity (TemporalOpsSpec: sub-ms ties matter). */
private[streaming] object EventTimeUs {

  /** Timestamp → microseconds since epoch (exact — Timestamp carries nanos;
    * `getTime` alone would floor sub-ms events onto the same millisecond). */
  def usOf(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** Microseconds since epoch → Timestamp (exact inverse of [[usOf]]). */
  def tsOf(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000L))
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Event-time timeout in the engine's milliseconds for a µs wake time:
    * strictly after both the wake instant (ceil to the next ms) and the
    * current watermark — `setTimeoutTimestamp` requires a future instant,
    * and an exact-ms wake must not fire a ms early. */
  def timeoutMs(wakeUs: Long, watermarkMs: Long): Long =
    math.max(Math.floorDiv(wakeUs, 1000L) + 1L, watermarkMs + 1L)
}
