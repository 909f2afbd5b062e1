package graft.multimodal

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column pipeline: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / resize / frame-sample
  * stages.
  *
  * The Spark-side plumbing — schema, partitioning, per-partition batch shape —
  * is real; the codec itself is STUBBED (this container ships no image/audio
  * libraries): `decodeStub` derives deterministic fake dimensions/features
  * from the bytes. Swapping in a real decoder changes ONE function and
  * nothing in the plan shape.
  *
  * Execution model: decode runs in `mapPartitions`, the Scala analog of a
  * vectorized `mapInPandas` stage — one decoder context per partition, rows
  * streamed through it (never a per-row UDF re-initializing the codec).
  * Assets are `repartition(assetId)`-distributed first so decode parallelism
  * is by asset, independent of the (possibly skewed, size-correlated) source
  * file layout — at 100 TB the binary column dominates I/O, so partition
  * count should target ~128 MB of payload per task.
  */
object MultimodalPipeline {

  /** An opaque media blob + typed metadata (modality ∈ image|audio|video). */
  final case class MediaAsset(
      assetId: Long,
      modality: String,
      bytes: Array[Byte],
      meta: Map[String, String])

  /** One decoded frame (images decode to exactly one). */
  final case class DecodedFrame(
      assetId: Long,
      frameIdx: Int,
      width: Int,
      height: Int,
      channels: Int,
      features: Array[Float])

  /** ======== STUB ======== deterministic fake decode: dimensions and a
    * 16-dim feature vector derived from md5(bytes ++ "#frameIdx"). A real
    * build replaces this body with the actual codec call; signature and call
    * sites stay. The salt is printable so the mm1 oracle can reconstruct the
    * digest with SQL's VARCHAR md5. */
  def decodeStub(bytes: Array[Byte], frameIdx: Int): (Int, Int, Int, Array[Float]) = {
    val md = MessageDigest.getInstance("MD5")
    md.update(bytes)
    md.update(("#" + frameIdx).getBytes(StandardCharsets.UTF_8))
    val d = md.digest()
    val w = 16 + (d(0) & 0x7f)
    val h = 16 + (d(1) & 0x7f)
    val features = Array.tabulate(16)(i => ((d(i) & 0xff) - 128) / 128.0f)
    (w, h, 3, features)
  }

  /** Frames per video asset when frame-sampling (every `stride`-th frame). */
  def frameIndices(meta: Map[String, String], stride: Int): Seq[Int] = {
    val n = meta.get("n_frames").map(_.toInt).getOrElse(1)
    0 until n by stride
  }

  /** Decode + frame-sample: one output row per sampled frame. Partition-level
    * batching; decoder state would be initialized once per partition here. */
  def decode(assets: Dataset[MediaAsset], stride: Int = 1): Dataset[DecodedFrame] = {
    import assets.sparkSession.implicits._
    assets
      .repartition(col("assetId"))
      .mapPartitions { it =>
        // real impl: open codec context once here
        it.flatMap { a =>
          val idxs = if (a.modality == "video") frameIndices(a.meta, stride) else Seq(0)
          idxs.iterator.map { fi =>
            val (w, h, c, feats) = decodeStub(a.bytes, fi)
            DecodedFrame(a.assetId, fi, w, h, c, feats)
          }
        }
      }
  }

  /** Resize: deterministic feature recomputation at a target resolution —
    * pure column-level transform over decoded frames (no re-decode). */
  def resize(frames: Dataset[DecodedFrame], targetW: Int, targetH: Int): Dataset[DecodedFrame] = {
    import frames.sparkSession.implicits._
    frames.map { f =>
      val scale = targetW.toFloat * targetH / (f.width.toFloat * f.height)
      f.copy(width = targetW, height = targetH,
        features = f.features.map(_ * scale))
    }
  }

  /** Demo/test asset source: wraps document texts as fake binary payloads
    * (videos get an n_frames metadata entry derived from doc length). */
  def syntheticAssets(spark: SparkSession, dir: String): Dataset[MediaAsset] = {
    import spark.implicits._
    graft.sources.Tables.documents(spark, dir)
      .select($"doc_id", $"text", $"n_chars")
      .as[(Long, String, Long)]
      .map { case (id, text, n) =>
        val modality = (id % 3) match {
          case 0 => "image"
          case 1 => "audio"
          case _ => "video"
        }
        val meta = if (modality == "video") Map("n_frames" -> ((n % 10) + 2).toString)
        else Map.empty[String, String]
        MediaAsset(id, modality, text.getBytes(StandardCharsets.UTF_8), meta)
      }
  }
}
