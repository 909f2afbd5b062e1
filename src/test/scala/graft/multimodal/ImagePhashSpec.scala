package graft.multimodal

import graft.SparkSpec
import graft.multimodal.MultimodalPipeline._

/** mm7's perceptual-hash dedup: dHash invariances, band/packing layout, and
  * the banded candidate join proven complete against brute force on a
  * planted near-dup corpus (the driver corpus's md5 rasters are mutually
  * unrelated, so the planted cases are what exercise the dup verdict). */
class ImagePhashSpec extends SparkSpec {
  import spark.implicits._

  private def img(id: Long, rgb: Array[Byte]): MediaAsset =
    MediaAsset(id, "image", Codec.writePpm(16, 16, rgb), Map.empty)

  /** Deterministic base raster with mid-range values (no clamp headroom
    * issues for the brightness shift). */
  private def baseRgb(seed: Int): Array[Byte] = {
    val rng = new scala.util.Random(seed)
    Array.fill(768)((30 + rng.nextInt(170)).toByte)
  }

  private def hashesOf(as: Seq[MediaAsset]): Map[Long, ImageHash] =
    imageHashes(spark.createDataset(as)).collect().map(h => h.assetId -> h).toMap

  /** Independent naive reference: per-pixel grayscale, 2×2 block sums,
    * wraparound row comparisons — written directly from the definition. */
  private def naiveHash(rgb: Array[Byte]): Seq[Int] = {
    def gray(x: Int, y: Int): Long = {
      val p = y * 16 + x
      ((rgb(3 * p) & 0xff) + (rgb(3 * p + 1) & 0xff) + (rgb(3 * p + 2) & 0xff)).toLong
    }
    def cell(cy: Int, cx: Int): Long =
      (for { dy <- 0 to 1; dx <- 0 to 1 } yield gray(2 * cx + dx, 2 * cy + dy)).sum
    (0 until 8).map { cy =>
      (0 until 8).foldLeft(0) { (b, cx) =>
        if (cell(cy, cx) > cell(cy, (cx + 1) % 8)) b | (1 << cx) else b
      }
    }
  }

  private def hamming(a: ImageHash, b: ImageHash): Int =
    java.lang.Long.bitCount(a.hLo ^ b.hLo) + java.lang.Long.bitCount(a.hHi ^ b.hHi)

  test("dHash matches the naive per-pixel reference on real corpus images") {
    val assets = codecAssets(spark, "/root/testdata/sf0.001")
      .filter(_.modality == "image").limit(25).collect()
    val got = hashesOf(assets.toSeq)
    assets.foreach { a =>
      val (_, _, rgb) = Codec.parsePpm(a.bytes)
      assert(got(a.assetId).bands.toSeq == naiveHash(rgb), s"asset ${a.assetId}")
    }
  }

  test("packed halves round-trip the row bands and are non-negative") {
    val hs = hashesOf((1L to 20L).map(i => img(i, baseRgb(i.toInt))))
    hs.values.foreach { h =>
      assert(h.hLo >= 0 && h.hHi >= 0)
      (0 until 8).foreach { j =>
        val fromPacked =
          if (j < 4) (h.hLo >> (8 * j)) & 255 else (h.hHi >> (8 * (j - 4))) & 255
        assert(fromPacked == h.bands(j), s"band $j of ${h.assetId}")
      }
    }
  }

  test("uniform brightness shift preserves the hash exactly") {
    val base = baseRgb(7)
    val brighter = base.map(b => ((b & 0xff) + 40).toByte)
    val hs = hashesOf(Seq(img(1, base), img(2, brighter)))
    assert(hamming(hs(1L), hs(2L)) == 0)
    assert(hs(1L).bands.toSeq == hs(2L).bands.toSeq)
  }

  test("banded candidates find planted near-dups; verdicts split dup vs unrelated") {
    val base = baseRgb(11)
    // near-dup: a handful of single-pixel edits — most 2x2 block sums keep
    // their ordering, so most row bytes survive and banding must collide
    val noisy = base.clone()
    Seq(5, 100, 300, 500, 700).foreach(i => noisy(i) = ((noisy(i) & 0xff) + 9).toByte)
    val others = (10L to 29L).map(i => img(i, baseRgb(1000 + i.toInt)))
    val all = Seq(img(1, base), img(2, noisy)) ++ others
    val hs = hashesOf(all)

    // brute-force truth: candidate iff ≥1 equal row byte; dup iff ham ≤ 12
    val ids = all.map(_.assetId)
    val bruteCand = (for {
      a <- ids; b <- ids if a < b
      shared = (0 until 8).count(j => hs(a).bands(j) == hs(b).bands(j))
      if shared >= 1
    } yield (a, b, shared.toLong)).toSet

    val mmDf = spark.createDataset(all)
    val hashes = imageHashes(mmDf).toDF()
    val bands = hashes.select($"assetId",
      org.apache.spark.sql.functions.posexplode($"bands").as(Seq("bj", "bv")))
    val cand = bands.select($"assetId".as("a"), $"bj", $"bv")
      .join(bands.select($"assetId".as("b"), $"bj", $"bv"), Seq("bj", "bv"))
      .filter($"a" < $"b")
      .groupBy($"a", $"b").count()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(cand == bruteCand)

    // the planted pair is a found candidate with a dup verdict...
    assert(bruteCand.exists { case (a, b, _) => a == 1L && b == 2L })
    assert(hamming(hs(1L), hs(2L)) <= 12,
      s"planted near-dup hamming ${hamming(hs(1L), hs(2L))}")
    // ...while unrelated images stay far above the threshold
    others.foreach { o =>
      assert(hamming(hs(1L), hs(o.assetId)) > 12, s"unrelated ${o.assetId} too close")
    }
  }

  test("hash rows are one narrow record per image, decoded once") {
    val dir = "/root/testdata/sf0.001"
    val n = codecAssets(spark, dir).filter(_.modality == "image").count()
    assert(imageHashes(codecAssets(spark, dir)).count() == n)
  }
}
