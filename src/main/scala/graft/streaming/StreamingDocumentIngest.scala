package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Ingest

/** Streaming document-index ingest — the document-side sibling of
  * [[StreamingVectorIngest]], completing the symmetry: each micro-batch of
  * NEW document rows folds through `Ingest.appendDocumentBatch`, the ONE
  * batch entry point, so every maintained at-rest document table —
  * shingles, minhash, bands, fingerprints, sizes, windows, postings, the
  * dup pair graph and cluster labels, the df-ranked containment prefix,
  * and the ORDER-dependent packing offsets (monotone stream batches take
  * the cost-∝-batch extend path; an out-of-order backfill batch triggers
  * the narrow-row re-prefix, exactly as in batch) — stays current under
  * live arrival, including the compaction sweep at each fold. Day-0
  * contract: the base indexes must exist (`Ingest.buildDocumentIndexes`)
  * before the stream starts. Replay safety is the shared ledger recipe —
  * see [[IdempotentFold]]. */
object StreamingDocumentIngest {

  private val Name = "doc_ingest"

  /** Start folding a STREAMING frame of document rows (`doc_id`, `text`,
    * plus whatever metadata columns the corpus carries) into the at-rest
    * document indexes under corpus key `d`. */
  def start(docs: DataFrame, d: String, checkpoint: String): StreamingQuery =
    IdempotentFold.start(docs, Name, d, checkpoint)(Ingest.appendDocumentBatch)

  /** One micro-batch — package-visible so the parity spec can drive the
    * replay case directly. */
  private[streaming] def foldBatch(s: SparkSession, d: String, ckpt: String)
      (batch: Dataset[Row], batchId: Long): Unit =
    IdempotentFold.foldBatch(s, Name, d, ckpt)(
      Ingest.appendDocumentBatch)(batch, batchId)
}
