package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.SimilarityQueries

/** Streaming vector-index ingest — the streaming analog of the daily
  * `SimilarityQueries.appendEmbeddings` batch: each micro-batch of NEW
  * embedding rows (`vec_id`, `embedding`) folds into every at-rest vector
  * index — LSH rank signatures, int8 SQ codes, and the frozen-quantizer
  * IVF / PQ / trained-k-means assignments, with the growth-triggered
  * quantizer retrain firing exactly as in batch — so ANN queries stay
  * current under live arrival and the corpus is never re-indexed. Day-0
  * contract: the base indexes must exist
  * (`SimilarityQueries.buildEmbeddingIndexes`) before the stream starts,
  * the same contract as the batch append path. Replay safety is the shared
  * ledger recipe — see [[IdempotentFold]]. */
object StreamingVectorIngest {

  private val Name = "vec_ingest"

  /** Start folding a STREAMING frame of (`vec_id`, `embedding`) rows into
    * the at-rest vector indexes under corpus key `d`. The returned query
    * runs until stopped; `checkpoint` scopes both the engine's offset
    * tracking and the replay ledger. */
  def start(vecs: DataFrame, d: String, checkpoint: String): StreamingQuery =
    IdempotentFold.start(vecs, Name, d, checkpoint)(SimilarityQueries.appendEmbeddings)

  /** One micro-batch — package-visible so the parity spec can drive the
    * replay case directly. */
  private[streaming] def foldBatch(s: SparkSession, d: String, ckpt: String)
      (batch: Dataset[Row], batchId: Long): Unit =
    IdempotentFold.foldBatch(s, Name, d, ckpt)(
      SimilarityQueries.appendEmbeddings)(batch, batchId)
}
