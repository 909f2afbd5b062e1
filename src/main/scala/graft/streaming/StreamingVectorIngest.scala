package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardOpenOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import graft.build.DerivedCache
import graft.operators.SimilarityQueries

/** Streaming vector-index ingest — the streaming analog of the daily
  * `SimilarityQueries.appendEmbeddings` batch, completing the online story
  * the document side already has (dd9/dd10 + `Ingest.appendDocumentBatch`):
  * each micro-batch of NEW embedding rows (`vec_id`, `embedding`) folds
  * into every at-rest vector index — LSH rank signatures, int8 SQ codes,
  * and the frozen-quantizer IVF / PQ / trained-k-means assignments, with
  * the growth-triggered quantizer retrain firing exactly as in batch — so
  * ANN queries stay current under live arrival and the corpus is never
  * re-indexed. Day-0 contract: the base indexes must exist
  * (`SimilarityQueries.buildEmbeddingIndexes`) before the stream starts,
  * the same contract as the batch append path.
  *
  * Replay safety: `foreachBatch` is at-least-once across restarts, and a
  * replayed batch would violate the append path's "vec_ids are new"
  * contract by double-appending every index row. A batch LEDGER file next
  * to the corpus's cache tables records each folded batch id (scoped per
  * checkpoint — batch ids are only unique within one); replayed ids are
  * skipped. This is the standard idempotent-foreachBatch recipe: O(1) per
  * batch, where the alternative — an existence anti-join against the
  * index — is exactly the corpus-sized read the append path exists to
  * avoid. The ledger line is written AFTER the fold, so the dedupe window
  * is honest-but-not-transactional: a crash between the last index append
  * and the ledger write re-folds that one batch on restart. A pipeline
  * needing strict exactly-once should land batches into a transactional
  * table format instead; everything above the sink is unchanged. */
object StreamingVectorIngest {

  /** Start folding a STREAMING frame of (`vec_id`, `embedding`) rows into
    * the at-rest vector indexes under corpus key `d`. The returned query
    * runs until stopped; `checkpoint` scopes both the engine's offset
    * tracking and the replay ledger. */
  def start(vecs: DataFrame, d: String, checkpoint: String): StreamingQuery = {
    val s = vecs.sparkSession
    val fold: (Dataset[Row], Long) => Unit = foldBatch(s, d, checkpoint)
    vecs.writeStream
      .foreachBatch(fold)
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .start()
  }

  /** One micro-batch: skip if empty or already folded, else append through
    * the SAME entry point as batch ingest and commit the ledger line.
    * Package-visible so the parity spec can drive the replay case
    * directly. */
  private[streaming] def foldBatch(s: SparkSession, d: String, ckpt: String)
      (batch: Dataset[Row], batchId: Long): Unit = {
    if (!batch.isEmpty && !folded(s, d, ckpt, batchId)) {
      SimilarityQueries.appendEmbeddings(s, d, batch.toDF())
      commit(s, d, ckpt, batchId)
    }
  }

  /** Ledger path: per (corpus key, checkpoint) — md5-discriminated like
    * [[DerivedCache.dirKey]], since distinct checkpoints may sanitize
    * identically. */
  private def ledger(s: SparkSession, d: String, ckpt: String): java.nio.file.Path = {
    val ck = java.security.MessageDigest.getInstance("MD5")
      .digest(ckpt.getBytes(UTF_8)).take(4).map("%02x".format(_)).mkString
    Paths.get(s"${DerivedCache.baseDir(s)}/${DerivedCache.dirKey(d)}/stream_vec_ingest_$ck.ledger")
  }

  private[streaming] def folded(s: SparkSession, d: String, ckpt: String,
      batchId: Long): Boolean = {
    val p = ledger(s, d, ckpt)
    Files.exists(p) &&
      Files.readAllLines(p).asScala.exists(_.trim == batchId.toString)
  }

  private def commit(s: SparkSession, d: String, ckpt: String, batchId: Long): Unit = {
    val p = ledger(s, d, ckpt)
    Files.createDirectories(p.getParent)
    Files.write(p, s"$batchId\n".getBytes(UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    ()
  }
}
