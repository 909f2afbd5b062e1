package graft.operators

import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint

import graft.SparkSpec

/** ss9's compressed-domain Hamming scan broadcasts its batch-signature
  * side — data-proportional (corpus/10 here), so the broadcast sits behind
  * the a03-style row-ceiling guard
  * ([[SimilarityQueries.KnnBroadcastMaxRowsKey]]). Over the ceiling the
  * scan degrades to a partition-pair cartesian of the two NARROW sig
  * frames (id + sig only — more network, never a driver OOM), and the
  * result must be identical in both modes. */
class SimilarityGuardSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("hammingTopK at a full-corpus pool equals the exact control bit-for-bit") {
    // the pool is THE recall/latency dial: at pool >= corpus the
    // compressed-domain scan admits everything and the exact rerank IS
    // ss1's brute-force ranking — same scores (stored nsq, identical
    // operation order), same ties, so the rows must match exactly
    spark.conf.set(SimilarityQueries.HamPoolKey, "1000000")
    try {
      val approx = SimilarityQueries.hammingTopK(spark, dir).collect().toSeq
      val exact = SimilarityQueries.queries("ss1_cosine_topk")(spark, dir).collect().toSeq
      assert(approx == exact, "full-pool hammingTopK must equal the exact control")
    } finally spark.conf.unset(SimilarityQueries.HamPoolKey)
  }

  test("knnJoin pool conf narrows the per-query candidate pool") {
    spark.conf.set(SimilarityQueries.KnnPoolKey, "1")
    try {
      val perQuery = SimilarityQueries.knnJoin(spark, dir)
        .groupBy("qid").count().collect()
      assert(perQuery.nonEmpty && perQuery.forall(_.getLong(1) == 1L),
        "pool=1 must yield exactly one neighbor per query")
    } finally spark.conf.unset(SimilarityQueries.KnnPoolKey)
  }

  test("ss9 over the batch ceiling drops the broadcast, result-identical") {
    val run = SimilarityQueries.queries("ss9_knn_join")
    val base = run(spark, dir).collect().toSeq
    assert(base.nonEmpty)
    spark.conf.set(SimilarityQueries.KnnBroadcastMaxRowsKey, "0")
    try {
      val df = run(spark, dir)
      val broadcastHints = df.queryExecution.analyzed.collect {
        case h: ResolvedHint if h.hints.strategy.exists(
          _.toString.toLowerCase.contains("broadcast")) => h
      }
      assert(broadcastHints.isEmpty,
        s"over-threshold ss9 must not force a broadcast: $broadcastHints")
      assert(df.collect().toSeq == base,
        "ss9 must return identical rows in both scan modes")
    } finally spark.conf.unset(SimilarityQueries.KnnBroadcastMaxRowsKey)
  }
}
