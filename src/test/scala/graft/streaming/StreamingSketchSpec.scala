package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.PipelineQueries

/** Streaming KMV sketch: exact parity with the batch p02 estimator after the
  * stream has consumed the same corpus — in any batch split order — plus
  * merge-function invariants. */
class StreamingSketchSpec extends SparkSpec {
  import spark.implicits._

  test("streamed sketch converges to the batch p02 estimate (bit-exact)") {
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.1" // estimator engages only above k hashes
    val docs = graft.sources.Tables.documents(spark, dir)
      .select($"source", $"text").collect()
      .map(r => (r.getString(0), r.getString(1)))

    val in = MemoryStream[(String, String)]
    val out = StreamingSketch.kmvBySource(in.toDF().toDF("source", "text"), k = 64)
    // foreachBatch processes batches IN ORDER, so overwriting per source
    // leaves exactly the final update — estimator-shape-agnostic (selecting
    // "max n_hashes" from a memory sink would break once the sketch is
    // full: later updates tie at k with different estimates)
    val finalEst = scala.collection.mutable.Map.empty[String, Double]
    val q = out.writeStream
      .outputMode(OutputMode.Update)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[KmvEstimate], _: Long) =>
        df.collect().foreach(e => finalEst(e.source) = e.kmv_est)
      }
      .start()
    try {
      // three uneven micro-batches, deliberately splitting sources across them
      val (b1, rest) = docs.splitAt(docs.length / 3)
      val (b2, b3) = rest.splitAt(rest.length / 2)
      Seq(b1, b2, b3).foreach { b => in.addData(b.toIndexedSeq); q.processAllAvailable() }

      val streamed = finalEst.toMap

      val batch = PipelineQueries.queries("p02_kmv_cardinality")(spark, dir)
        .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap

      assert(streamed.keySet == batch.keySet)
      batch.foreach { case (src, est) =>
        assert(streamed(src) == est,
          s"$src: streamed ${streamed(src)} != batch $est")
      }
    } finally q.stop()
  }

  test("merge is associative, commutative, bounded, and distinct") {
    val k = 4
    val a = Array(5L, 9L)
    val all = StreamingSketch.merge(a, Iterator(3L, 9L, 1L, 7L, 12L), k)
    assert(all.sameElements(Array(1L, 3L, 5L, 7L)), all.mkString(","))
    // order independence: two splits of the same elements agree
    val left = StreamingSketch.merge(
      StreamingSketch.merge(Array.empty, Iterator(12L, 3L), k), Iterator(1L, 9L, 5L, 7L), k)
    assert(all.sameElements(left))
    // estimator: exact below k, (k-1)/h_k at k
    assert(StreamingSketch.estimate(Array(1L, 2L), k) == 2.0)
    val full = Array(1L, 2L, 3L, 1000000L)
    assert(StreamingSketch.estimate(full, k) ==
      3.0 / (1000000L.toDouble / 4294967296.0))
  }
}
