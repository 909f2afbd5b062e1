package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Streaming as-of enrichment: maturation at the watermark, latest-at-or-
  * before matching incl. the no-match edge, right-state pruning to the
  * standing latest — and batch parity against operators.AsOf on the same
  * rows. */
class StreamingAsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("maturing lefts match latest at-or-before right; none when no right precedes") {
    implicit val sqlCtx = spark.sqlContext
    val leftIn = MemoryStream[(Long, Timestamp, Long)]
    val rightIn = MemoryStream[(Long, Timestamp, Long)]
    val cols = Seq("user_id", "ts", "event_id")
    val out = StreamingAsOf.joinBackward(
      leftIn.toDF().toDF(cols: _*), rightIn.toDF().toDF(cols: _*), "30 seconds")
    val q = out.writeStream.format("memory").queryName("asof_out")
      .outputMode(OutputMode.Append).start()
    try {
      // user 10: views at 40 and 90; purchases at 35 (before any view) and 100
      rightIn.addData((10L, ts(40), 20L), (10L, ts(90), 21L))
      leftIn.addData((10L, ts(35), 1L), (10L, ts(100), 2L))
      q.processAllAvailable() // wm → 70: purchase@35 matures, matches nothing
      rightIn.addData((99L, ts(5000), 90L)) // wm → 4970: purchase@100 matures
      q.processAllAvailable()

      val rows = spark.table("asof_out")
        .select($"user_id", $"event_id", $"asof_event_id")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
      assert(rows === Set(
        (10L, 1L, None), // no view at-or-before ts 35
        (10L, 2L, Some(21L)))) // latest of views {40, 90} ≤ 100
    } finally q.stop()
  }

  test("a key with no rights is evicted once its lefts mature (no leak)") {
    implicit val sqlCtx = spark.sqlContext
    val leftIn = MemoryStream[(Long, Timestamp, Long)]
    val rightIn = MemoryStream[(Long, Timestamp, Long)]
    val cols = Seq("user_id", "ts", "event_id")
    val out = StreamingAsOf.joinBackward(
      leftIn.toDF().toDF(cols: _*), rightIn.toDF().toDF(cols: _*), "30 seconds")
    val q = out.writeStream.format("memory").queryName("asof_leak")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1 has a left event and never any right: after the left
      // matures there is NOTHING to keep — the regression retained an
      // all-empty buffer with no timeout, leaking the key until query end
      leftIn.addData((1L, ts(100), 1L))
      q.processAllAvailable()
      Seq(10000L, 20000L, 30000L).foreach { s =>
        leftIn.addData((90L + s / 10000, ts(s), 1000L + s))
        q.processAllAvailable()
      }
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows <= 1,
        s"only the last unmatured runner may remain in state, got $stateRows rows")
    } finally q.stop()
  }

  test("pending lefts and standing rights survive a checkpointed restart") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft-asof-ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-asof-out").toString
    val leftIn = MemoryStream[(Long, Timestamp, Long)]
    val rightIn = MemoryStream[(Long, Timestamp, Long)]
    val cols = Seq("user_id", "ts", "event_id")
    def start() = StreamingAsOf.joinBackward(
        leftIn.toDF().toDF(cols: _*), rightIn.toDF().toDF(cols: _*), "30 seconds")
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append).start()

    val q1 = start()
    try {
      // view buffered, purchase pending (not yet past the watermark)
      rightIn.addData((10L, ts(50), 20L))
      leftIn.addData((10L, ts(80), 1L))
      q1.processAllAvailable()
    } finally q1.stop()

    val q2 = start() // recover AsOfBuffer from the checkpoint
    try {
      rightIn.addData((99L, ts(5000), 90L)) // run the watermark out
      q2.processAllAvailable()
      val rows = spark.read.parquet(outDir).filter($"user_id" === 10L)
        .select($"event_id", $"asof_event_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows === Set((1L, 20L)),
        s"recovered purchase must still match the pre-restart view: $rows")
    } finally q2.stop()
  }

  test("streaming result matches the batch AsOf operator on the same rows") {
    implicit val sqlCtx = spark.sqlContext
    val lefts = Seq((7L, ts(10), 1L), (7L, ts(60), 2L), (7L, ts(61), 3L),
      (8L, ts(30), 4L))
    val rights = Seq((7L, ts(10), 50L), (7L, ts(10), 51L), (7L, ts(55), 52L),
      (8L, ts(100), 53L))
    val cols = Seq("user_id", "ts", "event_id")

    val batch = graft.operators.AsOf.joinBackward(
        lefts.toDF(cols: _*), rights.toDF(cols: _*),
        Seq("user_id"), "ts", "event_id", Seq("event_id"))
      .collect()
      .map(r => r.getLong(2) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap

    val leftIn = MemoryStream[(Long, Timestamp, Long)]
    val rightIn = MemoryStream[(Long, Timestamp, Long)]
    val out = StreamingAsOf.joinBackward(
      leftIn.toDF().toDF(cols: _*), rightIn.toDF().toDF(cols: _*), "30 seconds")
    val q = out.writeStream.format("memory").queryName("asof_parity")
      .outputMode(OutputMode.Append).start()
    try {
      leftIn.addData(lefts: _*)
      rightIn.addData(rights: _*)
      q.processAllAvailable()
      rightIn.addData((99L, ts(100000), 99L)) // run the watermark out
      q.processAllAvailable()
      val streamed = spark.table("asof_parity").filter($"user_id" =!= 99L)
        .select($"event_id", $"asof_event_id")
        .collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toMap
      assert(streamed === batch,
        s"stream/batch divergence: $streamed vs $batch")
    } finally q.stop()
  }
}
