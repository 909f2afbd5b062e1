package graft.multimodal

import graft.SparkSpec
import graft.multimodal.MultimodalPipeline._

/** mm8's acoustic fingerprint: gain invariance, packing layout, and the
  * banded candidate join proven complete against brute force on planted
  * near-dup audio (the driver corpus's md5 streams are mutually unrelated,
  * so planted cases are what exercise the dup verdict). */
class AudioFingerprintSpec extends SparkSpec {
  import spark.implicits._

  private def wav(id: Long, samples: Array[Short]): MediaAsset =
    MediaAsset(id, "audio", Codec.writeWav(8000, samples), Map.empty)

  /** 256 deterministic samples, |v| < 8192 so gain ×2 can't clip. */
  private def baseSamples(seed: Int): Array[Short] = {
    val rng = new scala.util.Random(seed)
    Array.fill(256)((rng.nextInt(16384) - 8192).toShort)
  }

  private def fpsOf(as: Seq[MediaAsset]): Map[Long, AudioFingerprint] =
    audioFingerprints(spark.createDataset(as))
      .collect().map(f => f.assetId -> f).toMap

  /** Independent naive reference, straight from the definition. */
  private def naiveFp(samples: Array[Short]): Long = {
    val e = samples.grouped(8).map(_.map(v => v.toLong * v).sum).toArray
    (0 until 32).foldLeft(0L) { (fp, w) =>
      if (e(w) > e((w + 1) % 32)) fp | (1L << w) else fp
    }
  }

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("fingerprint matches the naive reference on real corpus audio") {
    val assets = codecAssets(spark, "/root/testdata/sf0.001")
      .filter(_.modality == "audio").limit(25).collect()
    val got = fpsOf(assets.toSeq)
    assets.foreach { a =>
      val (_, samples) = Codec.parseWav(a.bytes)
      assert(got(a.assetId).fp == naiveFp(samples), s"asset ${a.assetId}")
    }
  }

  test("bands slice the packed fingerprint; fp is non-negative 32-bit") {
    val hs = fpsOf((1L to 20L).map(i => wav(i, baseSamples(i.toInt))))
    hs.values.foreach { h =>
      assert(h.fp >= 0 && h.fp < (1L << 32))
      assert(h.bands.length == 4)
      (0 until 4).foreach { j =>
        assert(((h.fp >>> (8 * j)) & 255L).toInt == h.bands(j), s"band $j")
      }
    }
  }

  test("uniform gain change preserves the fingerprint exactly") {
    val base = baseSamples(3)
    val doubled = base.map(v => (v * 2).toShort)
    val negated = base.map(v => (-v).toShort)
    val hs = fpsOf(Seq(wav(1, base), wav(2, doubled), wav(3, negated)))
    assert(hs(1L).fp == hs(2L).fp)
    assert(hs(1L).fp == hs(3L).fp)
  }

  test("banded candidates find planted near-dups; verdicts split dup vs unrelated") {
    val base = baseSamples(17)
    // near-dup: edits inside two windows — at most 4 bits can flip (each
    // touched window participates in two comparisons)
    val edited = base.clone()
    Seq(8, 9, 200).foreach(i => edited(i) = (edited(i) / 2).toShort)
    val others = (10L to 29L).map(i => wav(i, baseSamples(500 + i.toInt)))
    val all = Seq(wav(1, base), wav(2, edited)) ++ others
    val hs = fpsOf(all)

    val ids = all.map(_.assetId)
    val bruteCand = (for {
      a <- ids; b <- ids if a < b
      shared = (0 until 4).count(j => hs(a).bands(j) == hs(b).bands(j))
      if shared >= 1
    } yield (a, b, shared.toLong)).toSet

    import org.apache.spark.sql.functions.posexplode
    val fps = audioFingerprints(spark.createDataset(all)).toDF()
    val bands = fps.select($"assetId", posexplode($"bands").as(Seq("bj", "bv")))
    val cand = bands.select($"assetId".as("a"), $"bj", $"bv")
      .join(bands.select($"assetId".as("b"), $"bj", $"bv"), Seq("bj", "bv"))
      .filter($"a" < $"b")
      .groupBy($"a", $"b").count()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(cand == bruteCand)

    assert(bruteCand.exists { case (a, b, _) => a == 1L && b == 2L })
    assert(hamming(hs(1L).fp, hs(2L).fp) <= 6,
      s"planted near-dup hamming ${hamming(hs(1L).fp, hs(2L).fp)}")
    others.foreach { o =>
      assert(hamming(hs(1L).fp, hs(o.assetId).fp) > 6, s"unrelated ${o.assetId} too close")
    }
  }
}
