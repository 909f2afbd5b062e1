package graft.build

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Skew hardening (round-1 verdict item 8): the co-occurrence self-join is
  * keyed on (frame_id, event_type), so a "hub" key — one frame where one
  * event type has H active users — produces an H-row group on both join
  * sides and H·(H-1)/2 output pairs. These tests pin the correctness of that
  * path under a deliberately skewed hub and the boundedness of the streaming
  * state (one set of H users per key, quadratic only in the stateless
  * expansion). At cluster scale the skew is handled by AQE's skew-join
  * splitting (enabled in Verify/Bench sessions); the quadratic OUTPUT is
  * inherent to co-occurrence semantics and bounded by per-frame activity —
  * the discretize-at-ingest design keeps H = per-frame concurrency, never
  * corpus size. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  private val Hub = 120 // users sharing one (frame, event_type)

  test("batch frameInteractions is exact under a hub (frame_id, event_type) key") {
    val dir = java.nio.file.Files.createTempDirectory("graft-skew").toString
    // hub: users 0..119 share type "H" in frame 0; background: pair (500, 501)
    // in type "B" frame 0; single actor in frame 1 fixes the grid span
    val hub = (0 until Hub).map(u => (u.toLong, new Timestamp(5000L), u.toLong, "H", 1.0))
    val rest = Seq(
      (900L, new Timestamp(7000L), 500L, "B", 1.0),
      (901L, new Timestamp(8000L), 501L, "B", 1.0),
      (902L, new Timestamp(3600L * 1000 + 5000L), 502L, "B", 1.0))
    (hub ++ rest).toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val g = EventGraph(spark, dir)
    val fi = g.frameInteractions.cache()
    try {
      // hub key explodes to exactly C(120,2) canonical pairs, weight 1 each
      val hubPairs = fi.filter($"frame_id" === 0 && $"actor1" < Hub && $"actor2" < Hub)
      assert(hubPairs.count() == Hub.toLong * (Hub - 1) / 2)
      assert(hubPairs.filter($"weight" =!= 1).count() == 0)
      assert(fi.filter($"actor1" >= $"actor2").count() == 0, "canonicalization under skew")
      // the background pair co-occurs in frame 0 via type B
      assert(fi.filter($"actor1" === 500 && $"actor2" === 501).count() == 1)
      // no cross-type pairs: hub users never pair with the B users
      assert(fi.filter($"actor1" < Hub && $"actor2" >= 500).count() == 0)
    } finally fi.unpersist()
  }

  test("streaming frameInteractions survives a hub window with bounded state") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String)]
    val events = in.toDF().toDF("ts", "user_id", "event_type")
    val out = graft.streaming.StreamingGraphBuilder
      .frameInteractions(events, deltaSeconds = 20, watermark = "30 seconds")
    val q = out.writeStream.format("memory").queryName("skew_fi_out")
      .outputMode(OutputMode.Append).start()
    try {
      // one window, one event type, Hub users — the worst-case state key:
      // stored state is ONE user set (Hub longs), not Hub² rows
      in.addData((0 until Hub).map(u => (new Timestamp(1000L), u.toLong, "H")): _*)
      q.processAllAvailable()
      in.addData((new Timestamp(1000L * 1000), 999L, "Z")) // advance watermark
      q.processAllAvailable()
      val rows = spark.table("skew_fi_out")
      assert(rows.count() == Hub.toLong * (Hub - 1) / 2)
      assert(rows.filter(col("actor1") >= col("actor2")).count() == 0)
      // state bound: the stateful operator kept ≤ a handful of keys, not
      // the quadratic pair space (pairs are expanded statelessly downstream)
      val progress = q.lastProgress
      val stateRows = progress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows <= 10, s"state should hold per-key sets, got $stateRows rows")
    } finally q.stop()
  }
}
