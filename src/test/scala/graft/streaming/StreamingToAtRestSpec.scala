package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.timeline.Timeline

/** End-to-end: streaming ingest (the reference's `add_timeline_node`, E2)
  * lands in the partitioned at-rest layout, and the timeline API answers
  * point lookups over it (`get_timeline_nodes`, E3) — the full
  * append-then-query loop on one engine. */
class StreamingToAtRestSpec extends SparkSpec {
  import spark.implicits._

  test("streamed frame-actor memberships are queryable via the timeline API") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-rest").toString
    val in = MemoryStream[(Timestamp, Long, String)]
    val events = in.toDF().toDF("ts", "user_id", "event_type")
    val out = StreamingGraphBuilder
      .frameActors(events, deltaSeconds = 20, watermark = "30 seconds")
      .withColumn("year", year($"ts_start"))
      .withColumn("month", month($"ts_start"))
      .withColumn("day", dayofmonth($"ts_start"))
    val q = out.writeStream
      .format("parquet")
      .option("path", s"$dir/fa")
      .option("checkpointLocation", s"$dir/ckpt")
      .partitionBy("year", "month", "day")
      .outputMode(OutputMode.Append)
      .start()
    try {
      def ts(s: Long) = new Timestamp(s * 1000)
      in.addData((ts(0), 1L, "A"), (ts(5), 2L, "A"), (ts(25), 3L, "A"))
      q.processAllAvailable()
      in.addData((ts(1000), 9L, "A")) // advance watermark, finalize windows
      q.processAllAvailable()
    } finally q.stop()

    val atRest = spark.read.parquet(s"$dir/fa")
    val tl = Timeline(atRest)
    // E3 point lookup at the first frame's timestamp
    val frame0 = tl.nodesAt(0L).select("actor_id")
      .collect().map(_.getLong(0)).toSet
    assert(frame0 == Set(1L, 2L))
    // range scan sees the second frame exclusively after t=0
    val later = tl.allAfter(0L).select("actor_id")
      .collect().map(_.getLong(0)).toSet
    assert(later.contains(3L) && !later.contains(1L))
    // the partition columns materialized for pruning
    assert(atRest.columns.toSet.intersect(Set("year", "month", "day")).size == 3)
  }
}
