package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Custom-state streaming sessionization: batch-parity session splits,
  * out-of-order arrivals folded in within the watermark, numbering
  * continuity across finalizations, bounded lateness. */
class StreamingSessionizerSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("gap split, out-of-order fold-in, numbering across finalizations") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long)]
    val events = in.toDF().toDF("ts", "user_id")
    val out = StreamingSessionizer.sessionize(events, gapSec = 60, watermark = "30 seconds")
    val q = out.writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1, burst one: 100..140 → watermark 110 after the batch
      in.addData((ts(100), 1L), (ts(140), 1L))
      q.processAllAvailable()
      // ts=120 is out of order but above the watermark → folds into burst
      // one; 400/410 start burst two (gap 260 > 60)
      in.addData((ts(120), 1L), (ts(400), 1L), (ts(410), 1L))
      q.processAllAvailable()
      // advance the watermark far past 410+60 so user 1's buffer times out
      in.addData((ts(5000), 2L))
      q.processAllAvailable()
      // push the watermark past user 2's burst (distinct user: a group that
      // receives data in a batch is served data, not its timeout)
      in.addData((ts(9000), 3L))
      q.processAllAvailable()

      val rows = spark.table("sess_out")
        .select($"user_id", $"session_id", $"n_events", $"ts_start", $"ts_end", $"dur_sec")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getTimestamp(3).getTime / 1000, r.getTimestamp(4).getTime / 1000, r.getLong(5)))
        .toSet
      assert(rows.contains((1L, 1L, 3L, 100L, 140L, 40L)),
        s"first burst should be one 3-event session incl. the ooo arrival: $rows")
      assert(rows.contains((1L, 2L, 2L, 400L, 410L, 10L)),
        s"second burst should be session 2: $rows")
      assert(rows.contains((2L, 1L, 1L, 5000L, 5000L, 0L)), s"user 2 singleton: $rows")
    } finally q.stop()
  }

  test("state survives a checkpointed restart: buffer and numbering continue") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sess-ckpt").toString
    // the memory sink cannot recover from a checkpoint; the file sink can
    val outDir = java.nio.file.Files.createTempDirectory("graft-sess-out").toString
    val in = MemoryStream[(Timestamp, Long)]
    def start() = StreamingSessionizer
      .sessionize(in.toDF().toDF("ts", "user_id"), gapSec = 60, watermark = "30 seconds")
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append).start()

    val q1 = start()
    try {
      in.addData((ts(100), 1L), (ts(120), 1L)) // open burst buffered in state
      q1.processAllAvailable()
    } finally q1.stop()

    val q2 = start() // recover SessionBuffer from the checkpoint
    try {
      in.addData((ts(130), 1L), (ts(400), 1L)) // extend recovered burst, open next
      q2.processAllAvailable()
      in.addData((ts(5000), 2L)) // run the watermark out
      q2.processAllAvailable()
      val got = spark.read.parquet(outDir).filter($"user_id" === 1L)
        .select($"session_id", $"n_events", $"ts_start", $"ts_end")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1),
          r.getTimestamp(2).getTime / 1000, r.getTimestamp(3).getTime / 1000)).toSet
      assert(got === Set(
        (1L, 3L, 100L, 130L), // pre-restart events + post-restart extension
        (2L, 1L, 400L, 400L)), // numbering continued after recovery
        got.toString)
    } finally q2.stop()
  }

  test("streaming result matches the batch a02 split on the same data") {
    implicit val sqlCtx = spark.sqlContext
    val data = Seq( // user 7: three sessions with ragged arrival order
      (ts(10), 7L), (ts(30), 7L), (ts(500), 7L), (ts(20), 7L),
      (ts(530), 7L), (ts(1200), 7L))
    val in = MemoryStream[(Timestamp, Long)]
    val out = StreamingSessionizer.sessionize(
      in.toDF().toDF("ts", "user_id"), gapSec = 60, watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("sess_parity")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(data: _*)
      q.processAllAvailable()
      in.addData((ts(100000), 99L)) // run the watermark out
      q.processAllAvailable()
      val got = spark.table("sess_parity").filter($"user_id" === 7L)
        .select($"session_id", $"n_events", $"dur_sec")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === Set((1L, 3L, 20L), (2L, 2L, 30L), (3L, 1L, 0L)), got.toString)
    } finally q.stop()
  }
}
