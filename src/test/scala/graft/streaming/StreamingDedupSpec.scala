package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Streaming horizon dedup: watermark-final verdicts, sessionized canonical
  * choice, normalization-equal fingerprints, bounded state, and parity
  * against a naive recompute of the same rule. */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)
  private val cols = Seq("doc_id", "ts", "text")
  private val Horizon = 100L // seconds

  /** Driver-side recompute: per normalized text, event-time-ordered docs
    * sessionize on the inactivity gap; the session head is canonical. */
  private def naive(rows: Seq[(Long, Timestamp, String)])
      : Map[Long, (Boolean, Long)] = {
    rows.groupBy(r => r._3.trim.toLowerCase.replaceAll("\\s+", " "))
      .values.flatMap { g =>
        var last = Long.MinValue; var anchor = -1L
        g.map(r => (r._2.getTime, r._1)).sorted.map { case (ms, id) =>
          val dup = anchor >= 0 && ms - last <= Horizon * 1000
          if (!dup) anchor = id
          last = ms
          id -> (dup, anchor)
        }
      }.toMap
  }

  test("verdicts match the naive sessionized recompute (parity)") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (1L, ts(100), "Hello   world"), // anchor
      (2L, ts(150), "hello world"),   // dup of 1 (gap 50 <= 100)
      (3L, ts(260), "HELLO WORLD "),  // gap 110 > 100: NEW session anchor
      (4L, ts(300), "hello world"),   // dup of 3
      (5L, ts(120), "other text"),    // singleton
      (6L, ts(100), "tie text"), (7L, ts(100), "tie  text")) // equal ts: min id wins
    val expected = naive(rows)
    val in = MemoryStream[(Long, Timestamp, String)]
    val out = StreamingDedup.dedup(in.toDF().toDF(cols: _*), "30 seconds", Horizon)
    val q = out.writeStream.format("memory").queryName("dedup_parity")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(rows: _*)
      q.processAllAvailable()
      in.addData((99L, ts(10000), "wm runner"))
      q.processAllAvailable()
      in.addData((98L, ts(20000), "wm runner 2"))
      q.processAllAvailable()
      val got = spark.table("dedup_parity").filter($"doc_id" < 90L)
        .select($"doc_id", $"is_dup", $"canonical_id").collect()
        .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap
      assert(got === expected, s"stream/naive divergence: $got vs $expected")
      assert(got(2L) == ((true, 1L)) && got(3L) == ((false, 3L)) &&
        got(7L) == ((true, 6L)))
    } finally q.stop()
  }

  test("a late-but-earlier doc becomes the canonical (watermark-final order)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String)]
    val out = StreamingDedup.dedup(in.toDF().toDF(cols: _*), "60 seconds", Horizon)
    val q = out.writeStream.format("memory").queryName("dedup_late")
      .outputMode(OutputMode.Append).start()
    try {
      // doc 10 arrives first but doc 11 (same text, EARLIER event time)
      // arrives within lateness: 11 must be the anchor, 10 the dup
      in.addData((10L, ts(100), "same same"))
      q.processAllAvailable()
      assert(spark.table("dedup_late").isEmpty, "nothing final before the wm")
      in.addData((11L, ts(80), "same  same"))
      q.processAllAvailable()
      in.addData((99L, ts(10000), "runner"))
      q.processAllAvailable()
      val got = spark.table("dedup_late").filter($"doc_id" < 90L)
        .select($"doc_id", $"is_dup", $"canonical_id").collect()
        .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap
      assert(got == Map(11L -> ((false, 11L)), 10L -> ((true, 11L))), got.toString)
    } finally q.stop()
  }

  test("quiet fingerprints are evicted (bounded state)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String)]
    val out = StreamingDedup.dedup(in.toDF().toDF(cols: _*), "30 seconds", Horizon)
    val q = out.writeStream.format("memory").queryName("dedup_state")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((1L, ts(100), "aa"), (2L, ts(110), "bb"), (3L, ts(120), "cc"))
      q.processAllAvailable()
      // march the watermark far past every horizon
      Seq(10000L, 20000L, 30000L).foreach { s =>
        in.addData((90L + s / 10000, ts(s), s"runner $s"))
        q.processAllAvailable()
      }
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows <= 2,
        s"only the last runners may remain in state, got $stateRows rows")
    } finally q.stop()
  }
}
