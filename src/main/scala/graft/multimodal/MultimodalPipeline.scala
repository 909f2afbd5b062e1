package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column pipeline: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / resize / frame-sample
  * stages.
  *
  * The Spark-side plumbing — schema, partitioning, per-partition batch shape —
  * is real, and so is every codec path (the round-1..12 `decodeStub` arm is
  * retired):
  *  - [[decodeCodec]] + [[codecAssets]]: uncompressed formats (PPM images,
  *    PCM16 WAVs, GRFV frame containers) with real parsers ([[Codec]]) —
  *    the mm3 oracle checks the decoded byte/sample sums end-to-end;
  *  - [[decode]] + [[realMediaAssets]]: the COMPRESSED/mixed corpus (zlib
  *    PNG, RIFF WAV, GRFV) decoded to real pixel/sample values that flow
  *    through real [[resize]] box-pooling and [[bucketFeatures]] — mm1/mm2.
  *
  * Execution model: decode runs in `mapPartitions`, the Scala analog of a
  * vectorized `mapInPandas` stage — one decoder context per partition, rows
  * streamed through it (never a per-row UDF re-initializing the codec).
  * Distribution happens on the NARROW per-document key rows ([[keyed]]):
  * every asset source repartitions (doc_id[, n_chars]) by doc_id at an
  * explicit width BEFORE the byte-generating map, and the generated blobs
  * then flow through parse/decode inside the same stage — media BYTES never
  * shuffle anywhere in this module. (Round 11: the consumers used to
  * `repartition(assetId)` the generated binaries, re-shuffling the whole
  * blob column once per query; the sf1 rung surfaced it as mm9's
  * super-linear tail.) At 100 TB you shuffle fetch lists, not payloads;
  * parallelism is by asset key, independent of the (possibly skewed,
  * size-correlated) source file layout.
  */
object MultimodalPipeline {

  /** Distribute the NARROW per-document key rows before byte generation —
    * EXPLICIT width, because AQE sees only the tiny key-shuffle bytes and
    * would coalesce the exchange feeding the size-expanding generate/decode
    * stage down to ~1 task (the dd7/g05 explode trap). Every asset source
    * goes through here; no consumer repartitions the generated binaries. */
  private def keyed(df: DataFrame): DataFrame = {
    val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    df.repartition(n, col("doc_id"))
  }

  /** An opaque media blob + typed metadata (modality ∈ image|audio|video). */
  final case class MediaAsset(
      assetId: Long,
      modality: String,
      bytes: Array[Byte],
      meta: Map[String, String])

  /** One REAL decoded frame: `vals` is the decoded payload — unsigned RGB
    * bytes (image/video, row-major interleaved, `channels` = 3) or PCM16
    * samples (audio, `height` = 1, `channels` = 1). Carrying the decoded
    * values (not a digest of them) is what makes the downstream stages —
    * [[resize]] and [[bucketFeatures]] — REAL transforms of real content. */
  final case class DecodedFrame(
      assetId: Long,
      modality: String,
      frameIdx: Int,
      width: Int,
      height: Int,
      channels: Int,
      vals: Array[Int])

  /** Frames per video asset when frame-sampling (every `stride`-th frame). */
  def frameIndices(meta: Map[String, String], stride: Int): Seq[Int] = {
    val n = meta.get("n_frames").map(_.toInt).getOrElse(1)
    0 until n by stride
  }

  /** REAL decode + frame-sample: one output row per sampled frame, every
    * byte parsed by the real codecs — PNG (chunk walk, CRC verify, inflate,
    * five-filter reconstruction), RIFF/WAV PCM16, GRFV frame container of
    * PPM frames. Partition-level batching (one Inflater context per
    * partition-stream, never a per-row re-init) — the Scala analog of a
    * vectorized `mapInPandas` decode stage. Replaces the round-1..12
    * `decodeStub` arm: every mm query is now real-decode-backed. */
  def decode(assets: Dataset[MediaAsset], stride: Int = 1): Dataset[DecodedFrame] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.flatMap { a =>
        a.modality match {
          case "image" =>
            val (w, h, rgb) = RealFormats.parsePng(a.bytes)
            Iterator.single(DecodedFrame(a.assetId, a.modality, 0, w, h, 3,
              rgb.map(_ & 0xff)))
          case "audio" =>
            val (_, samples) = Codec.parseWav(a.bytes)
            Iterator.single(DecodedFrame(a.assetId, a.modality, 0,
              samples.length, 1, 1, samples.map(_.toInt)))
          case _ =>
            frameIndices(a.meta, stride).iterator.map { fi =>
              val (w, h, rgb) = Codec.parsePpm(Codec.readGrfvFrame(a.bytes, fi))
              DecodedFrame(a.assetId, a.modality, fi, w, h, 3,
                rgb.map(_ & 0xff))
            }
        }
      }
    }
  }

  /** Resize by integer factor `k`: k×k box-average downsample of the real
    * pixel grid (channel-aware), TRUNCATING integer division (JVM `/` ==
    * DuckDB `//`, verified on negative sums) — every output value is an
    * exact integer function of the decoded input, so the oracle reproduces
    * it bit-for-bit. Audio "resizes" by pooling k² consecutive samples
    * (the same value-count reduction as the spatial pool). */
  def resize(frames: Dataset[DecodedFrame], k: Int): Dataset[DecodedFrame] = {
    import frames.sparkSession.implicits._
    frames.map { f =>
      if (f.height == 1) { // audio: 1-D pool by k²
        val p = k * k
        val outN = f.width / p
        val out = Array.tabulate(outN) { m =>
          var s = 0; var j = 0
          while (j < p) { s += f.vals(m * p + j); j += 1 }
          s / p
        }
        f.copy(width = outN, vals = out)
      } else {
        val ow = f.width / k
        val oh = f.height / k
        val out = new Array[Int](ow * oh * f.channels)
        var yy = 0
        while (yy < oh) {
          var xx = 0
          while (xx < ow) {
            var ch = 0
            while (ch < f.channels) {
              var s = 0
              var dy = 0
              while (dy < k) {
                var dx = 0
                while (dx < k) {
                  s += f.vals(((yy * k + dy) * f.width + (xx * k + dx)) * f.channels + ch)
                  dx += 1
                }
                dy += 1
              }
              out((yy * ow + xx) * f.channels + ch) = s / (k * k)
              ch += 1
            }
            xx += 1
          }
          yy += 1
        }
        f.copy(width = ow, height = oh, vals = out)
      }
    }
  }

  /** 16-dim bucket features over a frame's REAL decoded values: the value
    * range is split into 16 equal index buckets and each feature is the
    * bucket's normalized mean — computed as ONE float32 division of two
    * exact integers ((Σ − center·L) / (scale·L)), so DuckDB's REAL
    * arithmetic reproduces every bit. Bytes center at 128/128; PCM16
    * samples at 0/32768. */
  def bucketFeatures(f: DecodedFrame): Array[Float] = {
    val n = f.vals.length
    val len = n / 16
    val (center, scale) = if (f.modality == "audio") (0, 32768) else (128, 128)
    Array.tabulate(16) { i =>
      var s = 0L; var j = i * len
      val end = j + len
      while (j < end) { s += f.vals(j); j += 1 }
      (s - center.toLong * len).toFloat / (scale.toLong * len).toFloat
    }
  }

  /** One decoded frame from the REAL codec path — integer stats only, so
    * the DuckDB oracle can reproduce them exactly from the generation
    * formula. For image/video frames (s1,s2,s3) are the R/G/B channel byte
    * sums; for audio (s1,s2,s3) are (sample sum, max sample, min sample). */
  final case class CodecFrame(
      assetId: Long,
      frameIdx: Int,
      width: Int,
      height: Int,
      s1: Long,
      s2: Long,
      s3: Long)

  /** Single-asset generators for the REAL-codec corpus — the ONE place the
    * (doc key → media bytes) derivation lives, shared by the full corpus
    * source ([[codecAssets]]) and the ingest-time fingerprint derivation
    * ([[graft.operators.MultimodalQueries]]'s maintained table), so the
    * two can never drift. Modality is doc_id mod 3 (0 image, 1 audio,
    * 2 video). */
  def imageAsset(id: Long): MediaAsset =
    MediaAsset(id, "image",
      Codec.writePpm(16, 16, Codec.contentBytes(s"$id#img", 768)), Map.empty)

  def audioAsset(id: Long): MediaAsset =
    MediaAsset(id, "audio",
      Codec.writeWav(8000, Codec.contentSamples(s"$id#aud", 256)), Map.empty)

  def videoAsset(id: Long, nChars: Long): MediaAsset = {
    val nf = (nChars % 3 + 2).toInt
    val frames = (0 until nf).map(f =>
      Codec.writePpm(8, 8, Codec.contentBytes(s"$id#vid#$f", 192)))
    MediaAsset(id, "video", Codec.writeGrfv(frames),
      Map("n_frames" -> nf.toString))
  }

  /** REAL-format asset source: actual PPM images, PCM16 WAVs and GRFV frame
    * containers ([[Codec]]), content deterministically derived from the
    * document keys so the decode oracle is end-to-end checkable. */
  def codecAssets(spark: SparkSession, dir: String): Dataset[MediaAsset] = {
    import spark.implicits._
    keyed(graft.sources.Tables.documents(spark, dir)
      .select($"doc_id", $"n_chars"))
      .as[(Long, Long)]
      .map { case (id, n) =>
        (id % 3) match {
          case 0 => imageAsset(id)
          case 1 => audioAsset(id)
          case _ => videoAsset(id, n)
        }
      }
  }

  private def channelSums(w: Int, h: Int, rgb: Array[Byte]): (Long, Long, Long) = {
    var r = 0L; var g = 0L; var b = 0L
    var p = 0
    while (p < rgb.length) {
      val v = (rgb(p) & 0xff).toLong
      (p % 3) match {
        case 0 => r += v
        case 1 => g += v
        case _ => b += v
      }
      p += 1
    }
    (r, g, b)
  }

  /** REAL decode: parse the actual container bytes ([[Codec]] parsers —
    * header validation, chunk walking, frame-index extraction), emit
    * integer frame stats. Same execution model as [[decode]]: source-keyed
    * partitions, per-partition batch loop. */
  /** One structural-integrity verdict per asset (mm9): container parsed
    * with the REAL codec, measured byte/frame/unit counts emitted, `ok`
    * false (with −1 counts) on any malformed container instead of a
    * failed job — a corrupt blob in a 100-TB ingest must become a row in
    * a quarantine report, never a dead executor. */
  final case class IntegrityRow(
      assetId: Long,
      modality: String,
      nBytes: Long,
      nFrames: Long,
      nUnits: Long,
      ok: Boolean)

  /** Parse every asset's container structure and measure it: bytes on the
    * wire, frames indexed, payload units decoded (pixels / samples).
    * Per-asset-parallel after one assetId repartition, like every decode
    * pass here. */
  def integrity(assets: Dataset[MediaAsset]): Dataset[IntegrityRow] = {
    import assets.sparkSession.implicits._
    assets
      .map { a =>
        try {
          a.modality match {
            case "image" =>
              val (w, h, _) = Codec.parsePpm(a.bytes)
              IntegrityRow(a.assetId, a.modality, a.bytes.length.toLong, 1L,
                w.toLong * h, ok = true)
            case "audio" =>
              val (_, samples) = Codec.parseWav(a.bytes)
              IntegrityRow(a.assetId, a.modality, a.bytes.length.toLong, 1L,
                samples.length.toLong, ok = true)
            case _ =>
              val nf = Codec.grfvFrameCount(a.bytes)
              var units = 0L
              var i = 0
              while (i < nf) {
                val (w, h, _) = Codec.parsePpm(Codec.readGrfvFrame(a.bytes, i))
                units += w.toLong * h
                i += 1
              }
              IntegrityRow(a.assetId, a.modality, a.bytes.length.toLong,
                nf.toLong, units, ok = true)
          }
        } catch {
          case scala.util.control.NonFatal(_) =>
            IntegrityRow(a.assetId, a.modality, a.bytes.length.toLong, -1L, -1L,
              ok = false)
        }
      }
  }

  def decodeCodec(assets: Dataset[MediaAsset], stride: Int = 1): Dataset[CodecFrame] = {
    import assets.sparkSession.implicits._
    assets
      .mapPartitions { it =>
        it.flatMap { a =>
          a.modality match {
            case "image" =>
              val (w, h, rgb) = Codec.parsePpm(a.bytes)
              val (r, g, b) = channelSums(w, h, rgb)
              Iterator.single(CodecFrame(a.assetId, 0, w, h, r, g, b))
            case "audio" =>
              val (_, samples) = Codec.parseWav(a.bytes)
              var sum = 0L; var mx = Long.MinValue; var mn = Long.MaxValue
              samples.foreach { s => sum += s; mx = math.max(mx, s); mn = math.min(mn, s) }
              Iterator.single(CodecFrame(a.assetId, 0, samples.length, 1, sum, mx, mn))
            case _ =>
              val nf = Codec.grfvFrameCount(a.bytes)
              (0 until nf by stride).iterator.map { fi =>
                val (w, h, rgb) = Codec.parsePpm(Codec.readGrfvFrame(a.bytes, fi))
                val (r, g, b) = channelSums(w, h, rgb)
                CodecFrame(a.assetId, fi, w, h, r, g, b)
              }
          }
        }
      }
  }

  /** Absolute-difference stats of one consecutive video frame pair —
    * `sad` = Σ |byte difference| over the raster (the classic
    * shot-boundary metric), `maxd` = the largest single-byte jump. Integer
    * end to end so the oracle reproduces the bytes from the generation
    * formula. `frameIdx` is the EARLIER frame of the pair. */
  final case class FrameDelta(
      assetId: Long,
      frameIdx: Int,
      sad: Long,
      maxd: Long)

  /** Consecutive-frame raster deltas of every video container — the
    * temporal-structure primitive under scene-cut detection (mm6) and
    * keyframe selection. Same execution model as [[decodeCodec]]:
    * source-keyed partitions, per-partition loop; each asset's work is its
    * own frame count, so a million-video corpus parallelizes per asset
    * with no shuffle after the repartition. Frames decode once each — the
    * previous frame's raster is carried across the pair loop, never
    * re-parsed. */
  def frameDeltas(assets: Dataset[MediaAsset]): Dataset[FrameDelta] = {
    import assets.sparkSession.implicits._
    assets
      .filter(col("modality") === "video")
      .mapPartitions { it =>
        it.flatMap { a =>
          val nf = Codec.grfvFrameCount(a.bytes)
          var prev = Codec.parsePpm(Codec.readGrfvFrame(a.bytes, 0))._3
          (0 until nf - 1).iterator.map { fi =>
            val cur = Codec.parsePpm(Codec.readGrfvFrame(a.bytes, fi + 1))._3
            var sad = 0L
            var mx = 0L
            var i = 0
            while (i < prev.length) {
              val dv = math.abs((prev(i) & 0xff) - (cur(i) & 0xff)).toLong
              sad += dv
              if (dv > mx) mx = dv
              i += 1
            }
            prev = cur
            FrameDelta(a.assetId, fi, sad, mx)
          }
        }
      }
  }

  /** One fixed-size analysis window of a decoded PCM16 stream — integer
    * stats only (sum, min, max, energy = Σ v²) so the DuckDB oracle can
    * reproduce them exactly from the generation formula. */
  final case class AudioWindow(
      assetId: Long,
      winIdx: Int,
      nSamples: Int,
      sSum: Long,
      sMin: Long,
      sMax: Long,
      energy: Long)

  /** Windowed audio feature extraction over the REAL codec path: parse each
    * WAV (RIFF chunk walk), split the PCM16 stream into fixed windows of
    * `win` samples (last window may be short), emit per-window integer
    * features — the frame-level analysis stage (VAD, loudness, onset
    * detection) every audio pipeline layers over decode. Same execution
    * model as [[decodeCodec]]: source-keyed partitions, per-partition batch
    * loop, one decoder pass per asset. */
  def decodeWavWindows(assets: Dataset[MediaAsset], win: Int): Dataset[AudioWindow] = {
    import assets.sparkSession.implicits._
    assets
      .filter(col("modality") === "audio")
      .mapPartitions { it =>
        it.flatMap { a =>
          val (_, samples) = Codec.parseWav(a.bytes)
          samples.grouped(win).zipWithIndex.map { case (w, i) =>
            var sum = 0L; var mn = Long.MaxValue; var mx = Long.MinValue; var en = 0L
            w.foreach { v =>
              sum += v; mn = math.min(mn, v); mx = math.max(mx, v)
              en += v.toLong * v
            }
            AudioWindow(a.assetId, i, w.length, sum, mn, mx, en)
          }
        }
      }
  }

  /** One spatial tile of a decoded image — integer channel sums only, so
    * the DuckDB oracle reproduces them from the generation formula. */
  final case class ImageTile(
      assetId: Long,
      tileIdx: Int,
      w: Int,
      h: Int,
      sR: Long,
      sG: Long,
      sB: Long)

  /** Tiled image feature extraction over the REAL codec path: parse each
    * PPM, split the raster into a `grid × grid` tile grid (image dims must
    * divide evenly — loud failure otherwise), emit per-tile channel sums —
    * the patch/crop stage (patch embeddings, tile-level filtering) vision
    * pipelines layer over decode. Same execution model as [[decodeCodec]]. */
  def decodeImageTiles(assets: Dataset[MediaAsset], grid: Int): Dataset[ImageTile] = {
    import assets.sparkSession.implicits._
    assets
      .filter(col("modality") === "image")
      .mapPartitions { it =>
        it.flatMap { a =>
          val (w, h, rgb) = Codec.parsePpm(a.bytes)
          require(w % grid == 0 && h % grid == 0,
            s"dims ${w}x$h not divisible into a ${grid}x$grid tile grid")
          val (tw, th) = (w / grid, h / grid)
          val sums = Array.ofDim[Long](grid * grid, 3)
          var p = 0
          while (p < w * h) {
            val x = p % w; val y = p / w
            val t = (y / th) * grid + (x / tw)
            sums(t)(0) += rgb(3 * p) & 0xff
            sums(t)(1) += rgb(3 * p + 1) & 0xff
            sums(t)(2) += rgb(3 * p + 2) & 0xff
            p += 1
          }
          (0 until grid * grid).iterator.map { t =>
            ImageTile(a.assetId, t, tw, th, sums(t)(0), sums(t)(1), sums(t)(2))
          }
        }
      }
  }

  /** Perceptual hash of one image asset — 64-bit row-wise difference hash
    * (dHash): the decoded raster collapses to integer grayscale (r+g+b per
    * pixel, no division — exact), block-sums down to an 8×8 grid, and each
    * grid row yields 8 bits comparing horizontally adjacent cells (with
    * wraparound, so every row is a full byte). The hash is brightness- and
    * contrast-shift invariant (uniform pixel shifts preserve every
    * comparison), which is what makes it a near-dup signal rather than a
    * checksum. `bands` are the 8 row bytes — the LSH banding unit for the
    * candidate join (two near-dup images agree on most rows, so they
    * collide on at least one band; the dd3/ss3 banding argument in
    * Hamming space). `hLo`/`hHi` pack bands 0–3 / 4–7 little-endian, both
    * non-negative, so cross-engine `bit_count(xor(..))` needs no sign
    * handling. */
  final case class ImageHash(
      assetId: Long,
      hLo: Long,
      hHi: Long,
      bands: Array[Int])

  /** dHash every image asset (REAL codec path — PPM parse, not the stub).
    * Dimensions must divide 8×8 (loud failure otherwise). Same execution
    * model as [[decodeCodec]]: source-keyed partitions, per-partition loop,
    * each image decoded exactly once; output is one narrow 26-byte row per
    * image, the at-rest shape the candidate join scans. */
  def imageHashes(assets: Dataset[MediaAsset]): Dataset[ImageHash] = {
    import assets.sparkSession.implicits._
    assets
      .filter(col("modality") === "image")
      .mapPartitions { it =>
        it.map { a =>
          val (w, h, rgb) = Codec.parsePpm(a.bytes)
          require(w % 8 == 0 && h % 8 == 0,
            s"dims ${w}x$h not divisible into the 8x8 dHash grid")
          val (bw, bh) = (w / 8, h / 8)
          val cell = new Array[Long](64)
          var p = 0
          while (p < w * h) {
            val x = p % w; val y = p / w
            cell((y / bh) * 8 + x / bw) +=
              (rgb(3 * p) & 0xff) + (rgb(3 * p + 1) & 0xff) + (rgb(3 * p + 2) & 0xff)
            p += 1
          }
          val bands = new Array[Int](8)
          var cy = 0
          while (cy < 8) {
            var b = 0; var cx = 0
            while (cx < 8) {
              if (cell(cy * 8 + cx) > cell(cy * 8 + (cx + 1) % 8)) b |= 1 << cx
              cx += 1
            }
            bands(cy) = b
            cy += 1
          }
          val hLo = (0 until 4).map(j => bands(j).toLong << (8 * j)).sum
          val hHi = (4 until 8).map(j => bands(j).toLong << (8 * (j - 4))).sum
          ImageHash(a.assetId, hLo, hHi, bands)
        }
      }
  }

  /** dHash every PNG asset through the REAL-FORMAT decode path
    * ([[RealFormats.parsePng]]: chunk walk, CRC verify, inflate, five-filter
    * reconstruction) — the real-container sibling of [[imageHashes]], same
    * hash construction ([[RealFormats.dHash64]] is differential-tested
    * against it), same narrow at-rest row shape, same banding layout. */
  def pngHashes(assets: Dataset[MediaAsset]): Dataset[ImageHash] = {
    import assets.sparkSession.implicits._
    assets
      .mapPartitions { it =>
        it.map { a =>
          val (w, h, rgb) = RealFormats.parsePng(a.bytes)
          val (hLo, hHi) = RealFormats.dHash64(w, h, rgb)
          val bands = Array.tabulate(8)(j =>
            if (j < 4) ((hLo >>> (8 * j)) & 255L).toInt
            else ((hHi >>> (8 * (j - 4))) & 255L).toInt)
          ImageHash(a.assetId, hLo, hHi, bands)
        }
      }
  }

  /** dHash every JPEG asset through the REAL-WORLD lossy decode path
    * ([[RealFormats.decodeJpeg]]: the JDK's baseline codec — huffman decode,
    * dequantize, IDCT, YCbCr→RGB) — the third member of the image-hash
    * family (PPM [[imageHashes]], PNG [[pngHashes]]). Same hash
    * construction and narrow at-rest row shape; unlike PNG the decode is
    * LOSSY, so the fingerprint is NEAR the formula raster's (bounded drift,
    * mm14's audited invariant) rather than equal — which is exactly the
    * regime a perceptual hash is built for. */
  def jpegHashes(assets: Dataset[MediaAsset]): Dataset[ImageHash] = {
    import assets.sparkSession.implicits._
    assets
      .mapPartitions { it =>
        it.map { a =>
          val (w, h, rgb) = RealFormats.decodeJpeg(a.bytes)
          val (hLo, hHi) = RealFormats.dHash64(w, h, rgb)
          val bands = Array.tabulate(8)(j =>
            if (j < 4) ((hLo >>> (8 * j)) & 255L).toInt
            else ((hHi >>> (8 * (j - 4))) & 255L).toInt)
          ImageHash(a.assetId, hLo, hHi, bands)
        }
      }
  }

  /** Acoustic fingerprint of one audio asset — the energy-difference
    * fingerprint (the Haitsma–Kalker '02 construction reduced to one band):
    * the PCM16 stream splits into fixed windows, each window's integer
    * energy Σ v² is computed, and bit w records whether window w's energy
    * exceeds its successor's (wraparound, so the bit count equals the
    * window count). Sign-of-difference bits are amplitude-scale invariant
    * (uniform gain preserves every comparison), which is what makes this a
    * re-encode/volume-robust near-dup signal. `bands` are consecutive
    * 8-bit slices of `fp` — the LSH banding unit, exactly mm7's layout. */
  final case class AudioFingerprint(
      assetId: Long,
      fp: Long,
      bands: Array[Int])

  /** Fingerprint every audio asset (REAL codec path — RIFF chunk walk, not
    * the stub). The stream must split into 8..64 whole windows in whole
    * bands (loud failure otherwise — partial windows would make the last
    * bit depend on padding policy). Same execution model as
    * [[decodeCodec]]: source-keyed partitions, per-partition loop, each WAV
    * parsed exactly once; output is one narrow row per asset. */
  def audioFingerprints(assets: Dataset[MediaAsset], win: Int = 8): Dataset[AudioFingerprint] = {
    import assets.sparkSession.implicits._
    assets
      .filter(col("modality") === "audio")
      .mapPartitions { it =>
        it.map { a =>
          val (_, samples) = Codec.parseWav(a.bytes)
          energyFingerprint(a.assetId, samples, win)
        }
      }
  }

  /** The fingerprint formula itself, shared by the PCM arm above and the
    * ADPCM real-decode arm below — ONE derivation, so mm17's drift bound
    * measures the CODEC, never a formula divergence. */
  private[multimodal] def energyFingerprint(
      assetId: Long, samples: Array[Short], win: Int): AudioFingerprint = {
    require(samples.length % win == 0,
      s"${samples.length} samples not whole $win-sample windows")
    val nw = samples.length / win
    require(nw % 8 == 0 && nw >= 8 && nw <= 64,
      s"$nw windows not packable into whole 8-bit bands of one long")
    val e = new Array[Long](nw)
    var i = 0
    while (i < samples.length) {
      val v = samples(i).toLong
      e(i / win) += v * v
      i += 1
    }
    var fp = 0L
    var w = 0
    while (w < nw) {
      if (e(w) > e((w + 1) % nw)) fp |= 1L << w
      w += 1
    }
    AudioFingerprint(assetId, fp,
      Array.tabulate(nw / 8)(j => ((fp >>> (8 * j)) & 255L).toInt))
  }

  /** Real lossy audio corpus: the SAME PCM streams as [[audioAsset]],
    * IMA-ADPCM-encoded (4-bit adaptive quantizer, format tag 0x11 WAV —
    * [[RealAudio]]), the audio sibling of [[jpegAssets]]' recompression
    * relationship to [[pngAssets]]. */
  def adpcmAsset(id: Long): MediaAsset =
    MediaAsset(id, "audio",
      RealAudio.writeWavAdpcm(8000, Codec.contentSamples(s"$id#aud", 256)),
      Map("format" -> "adpcm"))

  /** Fingerprint the ADPCM corpus through the REAL lossy decode
    * ([[RealAudio.parseWavAdpcm]]: chunk walk, fact cross-check, adaptive
    * staircase reconstruction) — same formula, same execution model as
    * [[audioFingerprints]]; mm17 bounds the resulting drift against the
    * exactly-proven PCM arm. */
  def adpcmFingerprints(assets: Dataset[MediaAsset], win: Int = 8): Dataset[AudioFingerprint] = {
    import assets.sparkSession.implicits._
    assets
      .filter(col("modality") === "audio")
      .mapPartitions { it =>
        it.map { a =>
          val (_, samples) = RealAudio.parseWavAdpcm(a.bytes)
          energyFingerprint(a.assetId, samples, win)
        }
      }
  }

  // ----------------------------------------------- real-world formats ----

  /** Raster for the real-format (PNG/JPEG) corpus of document `id` — the
    * ONE place the content derivation lives (same md5-chain discipline as
    * [[imageAsset]]); the PNG and JPEG variants encode THIS raster, so the
    * JPEG corpus is a true recompression of the PNG corpus and the
    * invariance specs compare like with like. */
  def realRaster(id: Long): Array[Byte] = Codec.contentBytes(s"$id#png", 768)

  /** Real PNG corpus: every image-modality document as a spec-conformant
    * truecolor PNG ([[RealFormats.writePng]] — zlib IDAT, CRC32 chunks). */
  def pngAssets(spark: SparkSession, dir: String): Dataset[MediaAsset] = {
    import spark.implicits._
    keyed(graft.sources.Tables.documents(spark, dir)
      .select($"doc_id")).as[Long]
      .filter((id: Long) => id % 3 == 0)
      .map(id => MediaAsset(id, "image",
        RealFormats.writePng(16, 16, realRaster(id)), Map("format" -> "png")))
  }

  /** Real JPEG corpus: the SAME rasters baseline-JPEG-encoded by the JDK
    * codec at quality 0.95 — a lossy recompression of [[pngAssets]]. */
  def jpegAssets(spark: SparkSession, dir: String): Dataset[MediaAsset] = {
    import spark.implicits._
    keyed(graft.sources.Tables.documents(spark, dir)
      .select($"doc_id")).as[Long]
      .filter((id: Long) => id % 3 == 0)
      .map(id => MediaAsset(id, "image",
        RealFormats.writeJpeg(16, 16, realRaster(id)), Map("format" -> "jpeg")))
  }

  /** Decoded-PNG statistics row: structural inventory (chunk count) plus
    * integer channel sums of the decoded raster. PNG is lossless, so the
    * sums equal the generation formula's — the oracle recomputes them with
    * zero binary parsing while the engine ran a full real decode (chunk
    * walk, CRC checks, inflate, unfilter). */
  final case class PngStatsRow(
      assetId: Long,
      width: Int,
      height: Int,
      nChunks: Int,
      sR: Long,
      sG: Long,
      sB: Long)

  /** Decode every PNG with the hand-rolled real decoder and reduce each
    * raster to channel sums. Same execution model as [[decodeCodec]]:
    * source-keyed partitions, per-partition loop, one decode per asset. */
  def decodePngStats(assets: Dataset[MediaAsset]): Dataset[PngStatsRow] = {
    import assets.sparkSession.implicits._
    assets
      .mapPartitions { it =>
        it.map { a =>
          val (s, rgb) = RealFormats.parsePngFull(a.bytes)
          val (r, g, b) = channelSums(s.width, s.height, rgb)
          PngStatsRow(a.assetId, s.width, s.height, s.nChunks, r, g, b)
        }
      }
  }

  /** Structural-audit row for one JPEG asset (the mm9 discipline on a real
    * compressed format): frame header facts from the marker walk, `ok`
    * false with −1 fields on malformed streams (quarantine rows, never
    * failed jobs). */
  final case class JpegAuditRow(
      assetId: Long,
      width: Int,
      height: Int,
      nComponents: Int,
      precision: Int,
      ok: Boolean)

  /** Marker-walk every JPEG ([[RealFormats.parseJpeg]] — segment lengths,
    * SOF frame header, entropy-scan skip with byte-stuffing/restart rules)
    * and report the frame structure. */
  def jpegAudit(assets: Dataset[MediaAsset]): Dataset[JpegAuditRow] = {
    import assets.sparkSession.implicits._
    assets
      .map { a =>
        try {
          val s = RealFormats.parseJpeg(a.bytes)
          JpegAuditRow(a.assetId, s.width, s.height, s.nComponents, s.precision, ok = true)
        } catch {
          case scala.util.control.NonFatal(_) =>
            JpegAuditRow(a.assetId, -1, -1, -1, -1, ok = false)
        }
      }
  }

  /** Real MP3 corpus: every audio-modality document as a structurally
    * spec-conformant MPEG-1 Layer III stream ([[RealContainers.writeMp3]]
    * — ID3v2 prefix, alternating-padding frame chain, Xing header). The
    * stream parameters are closed-form in the doc keys so the mm15 oracle
    * derives the expected structure with zero byte parsing:
    * bitrate index `1 + doc_id % 14`, sample-rate index `(doc_id/3) % 3`,
    * `2 + n_chars % 5` frames, `16 + n_chars % 16` ID3 padding bytes. */
  def mp3Assets(spark: SparkSession, dir: String): Dataset[MediaAsset] = {
    import spark.implicits._
    keyed(graft.sources.Tables.documents(spark, dir)
      .select($"doc_id", $"n_chars")).as[(Long, Long)]
      .filter((r: (Long, Long)) => r._1 % 3 == 1)
      .map { case (id, nChars) =>
        MediaAsset(id, "audio",
          RealContainers.writeMp3(s"$id#mp3",
            nFrames = 2 + (nChars % 5).toInt,
            brIdx = 1 + (id % 14).toInt,
            srIdx = ((id / 3) % 3).toInt,
            id3Payload = 16 + (nChars % 16).toInt),
          Map("format" -> "mp3"))
      }
  }

  /** Real MP4 corpus: every video-modality document as a structurally
    * spec-conformant single-track ISO-BMFF file
    * ([[RealContainers.writeMp4]]) carrying `n_chars % 3 + 2` samples —
    * the same frame count as the GRFV corpus, so the two video paths
    * audit the same mass through different real containers. */
  def mp4Assets(spark: SparkSession, dir: String): Dataset[MediaAsset] = {
    import spark.implicits._
    keyed(graft.sources.Tables.documents(spark, dir)
      .select($"doc_id", $"n_chars")).as[(Long, Long)]
      .filter((r: (Long, Long)) => r._1 % 3 == 2)
      .map { case (id, nChars) =>
        MediaAsset(id, "video",
          RealContainers.writeMp4(s"$id#mp4", (nChars % 3).toInt + 2),
          Map("format" -> "mp4"))
      }
  }

  /** mm15 audit row: MP3 frame-chain structure; `ok` false with −1 fields
    * on malformed streams (quarantine rows, never failed jobs). */
  final case class Mp3AuditRow(
      assetId: Long,
      nFrames: Int,
      sampleRate: Int,
      bitrateKbps: Int,
      nStreamBytes: Long,
      nSamples: Long,
      xingFrames: Int,
      ok: Boolean)

  /** Frame-sync-walk every MP3 ([[RealContainers.parseMp3]]). */
  def mp3Audit(assets: Dataset[MediaAsset]): Dataset[Mp3AuditRow] = {
    import assets.sparkSession.implicits._
    assets
      .map { a =>
        try {
          val s = RealContainers.parseMp3(a.bytes)
          Mp3AuditRow(a.assetId, s.nFrames, s.sampleRate, s.bitrateKbps,
            s.nStreamBytes, s.nSamples, s.xingFrames, ok = true)
        } catch {
          case scala.util.control.NonFatal(_) =>
            Mp3AuditRow(a.assetId, -1, -1, -1, -1L, -1L, -1, ok = false)
        }
      }
  }

  /** mm16 audit row: ISO-BMFF box-walk structure; `ok` false with −1
    * fields on malformed files (quarantine rows, never failed jobs). */
  final case class Mp4AuditRow(
      assetId: Long,
      nBoxes: Int,
      majorBrand: String,
      timescale: Int,
      durationTicks: Int,
      nSamples: Int,
      mdatBytes: Long,
      totalBytes: Long,
      ok: Boolean)

  /** Box-walk every MP4 ([[RealContainers.parseMp4]]). */
  def mp4Audit(assets: Dataset[MediaAsset]): Dataset[Mp4AuditRow] = {
    import assets.sparkSession.implicits._
    assets
      .map { a =>
        try {
          val s = RealContainers.parseMp4(a.bytes)
          Mp4AuditRow(a.assetId, s.nBoxes, s.majorBrand, s.timescale,
            s.duration, s.nSamples, s.mdatBytes, s.nBytes, ok = true)
        } catch {
          case scala.util.control.NonFatal(_) =>
            Mp4AuditRow(a.assetId, -1, "", -1, -1, -1, -1L, -1L, ok = false)
        }
      }
  }

  /** The PNG twin of [[imageAsset]]: the SAME deterministic raster content
    * (salt `#img`, 768 bytes) in a spec-conformant compressed container —
    * zlib IDAT, CRC32 chunks — so the decode→content oracle chain is shared
    * with mm3 while the engine pays a real compressed-codec decode. */
  def pngImageAsset(id: Long): MediaAsset =
    MediaAsset(id, "image",
      RealFormats.writePng(16, 16, Codec.contentBytes(s"$id#img", 768)),
      Map("format" -> "png"))

  /** The REAL mixed-modality corpus behind mm1/mm2 (the former stub arm):
    * PNG images, PCM16 WAVs, GRFV frame containers — every byte produced
    * by a real encoder and consumed by a real parser ([[decode]]). */
  def realMediaAssets(spark: SparkSession, dir: String): Dataset[MediaAsset] = {
    import spark.implicits._
    keyed(graft.sources.Tables.documents(spark, dir)
      .select($"doc_id", $"n_chars"))
      .as[(Long, Long)]
      .map { case (id, n) =>
        (id % 3) match {
          case 0 => pngImageAsset(id)
          case 1 => audioAsset(id)
          case _ => videoAsset(id, n)
        }
      }
  }
}
