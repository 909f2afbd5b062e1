package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Streaming ingest semantics (SURVEY.md §2.G streaming): tumbling Δ-frames,
  * equal-ts merge via window aggregation, late (out-of-order) arrivals
  * accepted inside the watermark, too-late arrivals dropped — the reference's
  * interior-insert path (`BaseTimeline.java:226-271`) with the documented
  * bounded-lateness deviation. */
class StreamingGraphBuilderSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("frameActors: windows, dedup-by-frame, late-within-watermark, drop-too-late") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String)]
    val events = in.toDF().toDF("ts", "user_id", "event_type")
    val out = StreamingGraphBuilder.frameActors(events, deltaSeconds = 20, watermark = "30 seconds")
    val q = out.writeStream.format("memory").queryName("fa_out")
      .outputMode(OutputMode.Append).start()
    try {
      // in-order batch: users 1,2 in frame [0,20), user 3 in [20,40)
      in.addData((ts(0), 1L, "A"), (ts(5), 2L, "A"), (ts(5), 1L, "A"), (ts(25), 3L, "A"))
      q.processAllAvailable()
      // out-of-order arrival still inside the watermark → interior insert
      in.addData((ts(15), 4L, "A"))
      q.processAllAvailable()
      // far-future event advances the watermark, finalizing old windows
      in.addData((ts(1000), 9L, "A"))
      q.processAllAvailable()
      // too-late event (watermark is now ~970) → dropped
      in.addData((ts(30), 7L, "A"))
      q.processAllAvailable()

      val rows = spark.table("fa_out")
        .select($"ts_start", $"actor_id", $"n_events")
        .collect().map(r => (r.getTimestamp(0).getTime / 1000, r.getLong(1), r.getLong(2))).toSet
      assert(rows.contains((0L, 1L, 2L)), s"equal-frame merge lost: $rows") // two events, one row
      assert(rows.contains((0L, 2L, 1L)))
      assert(rows.contains((0L, 4L, 1L)), "late-but-in-watermark arrival missing")
      assert(rows.contains((20L, 3L, 1L)))
      assert(!rows.exists(r => r._2 == 7L), s"too-late arrival not dropped: $rows")
    } finally q.stop()
  }

  test("frameInteractions: co-occurrence pairs with canonical order and weights") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String)]
    val events = in.toDF().toDF("ts", "user_id", "event_type")
    val out = StreamingGraphBuilder.frameInteractions(events, deltaSeconds = 20, watermark = "30 seconds")
    val q = out.writeStream.format("memory").queryName("fi_out")
      .outputMode(OutputMode.Append).start()
    try {
      // frame [0,20): users 1,2,3 share type A; users 2,3 also share type B
      in.addData(
        (ts(1), 1L, "A"), (ts(2), 2L, "A"), (ts(3), 3L, "A"),
        (ts(4), 2L, "B"), (ts(5), 3L, "B"))
      q.processAllAvailable()
      in.addData((ts(1000), 9L, "Z")) // advance watermark to finalize
      q.processAllAvailable()

      val rows = spark.table("fi_out")
        .select($"ts_start", $"actor1", $"actor2", $"weight")
        .collect().map(r => ((r.getTimestamp(0).getTime / 1000, r.getLong(1), r.getLong(2)), r.getLong(3)))
        .toMap
      assert(rows((0L, 1L, 2L)) == 1L)
      assert(rows((0L, 1L, 3L)) == 1L)
      assert(rows((0L, 2L, 3L)) == 2L, s"shared A+B should weigh 2: $rows")
      assert(rows.keySet.forall { case (_, a1, a2) => a1 < a2 }, "canonicalization violated")
    } finally q.stop()
  }

  test("dedupDocuments: one representative per fingerprint within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String)]
    val docs = in.toDF().toDF("ts", "doc_id", "text")
    val out = StreamingGraphBuilder.dedupDocuments(docs, watermark = "30 seconds")
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((ts(1), 1L, "hello world"), (ts(10), 3L, "something else"))
      q.processAllAvailable()
      // same normalized fingerprint, later batches -> dropped
      in.addData((ts(5), 2L, "  HELLO   world "))
      q.processAllAvailable()
      in.addData((ts(20), 4L, "hello world"))
      q.processAllAvailable()
      in.addData((ts(1000), 9L, "advance")) // evict state via watermark
      q.processAllAvailable()

      val ids = spark.table("dedup_out").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(ids.contains(1L) && ids.contains(3L) && ids.contains(9L))
      assert(!ids.contains(2L) && !ids.contains(4L), s"duplicates leaked: $ids")
    } finally q.stop()
  }
}
