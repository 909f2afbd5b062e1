package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.build.{DerivedCache, DocTables}
import graft.operators.ReachabilityQueries

/** The reference's addNode-then-query loop for the REACHABILITY index:
  * streamed events discretize into frame interactions
  * (StreamingGraphBuilder), and each finalized micro-batch folds into the
  * at-rest temporal adjacency via
  * [[ReachabilityQueries.appendInteractions]] — so g01's index stays
  * current under live ingest, never rebuilt from history. Asserts the
  * cross-batch MERGE case: a pair active on an already-indexed day and
  * again in a streamed frame must union its frame sets. */
class StreamingAdjacencySpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("streamed interactions fold into the at-rest adjacency index") {
    implicit val sqlCtx = spark.sqlContext
    val key = s"/streaming-adj/${java.util.UUID.randomUUID()}"
    val delta = 20L

    // day 0 (historical batch ingest): pair (1,2) active in frame 99
    val baseFi = Seq((99L, 1L, 2L)).toDF("frame_id", "actor1", "actor2")
    DerivedCache.table(spark, key, DocTables.TemporalAdj)(
      ReachabilityQueries.adjacencyRowsOf(baseFi))

    val in = MemoryStream[(Timestamp, Long, String)]
    val events = in.toDF().toDF("ts", "user_id", "event_type")
    // frame_id via the batch discretization formula (start = epoch 0)
    val fi = StreamingGraphBuilder
      .frameInteractions(events, delta, watermark = "30 seconds")
      .withColumn("frame_id", (unix_timestamp($"ts_start") / delta).cast("long"))
      .select($"frame_id", $"actor1", $"actor2")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-stream-adj").toString
    val fold: (Dataset[Row], Long) => Unit = (batch, _) =>
      if (!batch.isEmpty) {
        ReachabilityQueries.appendInteractions(spark, key, batch)
      }
    val q = fi.writeStream
      .foreachBatch(fold)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append)
      .start()
    try {
      def ts(s: Long) = new Timestamp(s * 1000)
      // frame 0: users 1,2 — frame 1: users 1,2,3
      in.addData((ts(0), 1L, "A"), (ts(5), 2L, "A"),
        (ts(25), 1L, "A"), (ts(26), 2L, "A"), (ts(27), 3L, "A"))
      q.processAllAvailable()
      // watermark → 30: finalizes frame 0 only → first append call
      in.addData((ts(60), 8L, "A"))
      q.processAllAvailable()
      // watermark → 970: finalizes frame 1 (and the pairless frame of the
      // single user 8) → second append call; (1,2) must MERGE across calls
      in.addData((ts(1000), 9L, "A"))
      q.processAllAvailable()
    } finally q.stop()

    val streamedFi = Seq(
      (0L, 1L, 2L),
      (1L, 1L, 2L), (1L, 1L, 3L), (1L, 2L, 3L)).toDF("frame_id", "actor1", "actor2")
    assert(rows(DerivedCache.existing(spark, key, DocTables.TemporalAdj))
        == rows(ReachabilityQueries.adjacencyRowsOf(baseFi.unionAll(streamedFi))),
      "streamed adjacency must equal the batch build over base ∪ finalized frames")
  }
}
