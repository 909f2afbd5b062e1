package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import graft.SparkSpec
import graft.multimodal.MultimodalPipeline._

/** Real-world format codecs (round-9 verdict item 1): the PNG
  * encoder/decoder round-trips losslessly, interoperates BOTH ways with an
  * independent encoder/decoder (ImageIO — adaptive filtering exercises the
  * Sub/Up/Average/Paeth reconstruction paths our own filter-0 stream never
  * would), fails loudly on corruption, and the JPEG marker walk + decode
  * behave like a real pipeline stage (structure facts, bounded lossy error,
  * dHash recompression invariance). */
class RealFormatsSpec extends SparkSpec {
  import spark.implicits._

  private def raster(seed: Int, w: Int, h: Int): Array[Byte] = {
    val rng = new scala.util.Random(seed)
    Array.fill(w * h * 3)(rng.nextInt(256).toByte)
  }

  /** Smooth gradient + gentle texture — the content class real photos live
    * in, where lossy-codec behavior is representative (md5 noise is the
    * adversarial case and belongs to the structure tests, not fidelity). */
  private def gradient(seed: Int, w: Int, h: Int): Array[Byte] = {
    val rng = new scala.util.Random(seed)
    val base = Array.fill(3)(rng.nextInt(128))
    Array.tabulate(w * h * 3) { j =>
      val p = j / 3; val c = j % 3
      val x = p % w; val y = p / w
      ((base(c) + x * 96 / w + y * 32 / h) & 0xff).toByte
    }
  }

  // ------------------------------------------------------------------ PNG --

  test("PNG round-trip is lossless and structure is the encoder contract") {
    for (seed <- 1 to 5) {
      val rgb = raster(seed, 16, 16)
      val png = RealFormats.writePng(16, 16, rgb)
      val (s, back) = RealFormats.parsePngFull(png)
      assert(back.sameElements(rgb), s"seed $seed raster")
      assert(s.width == 16 && s.height == 16 && s.bitDepth == 8 && s.colorType == 2)
      assert(s.nChunks == 3, "IHDR + IDAT + IEND")
    }
  }

  test("our decoder reads ImageIO-encoded PNGs (adaptive filters) exactly") {
    for ((w, h, seed) <- Seq((16, 16, 7), (40, 24, 8), (64, 64, 9))) {
      val rgb = gradient(seed, w, h) // smooth content triggers Sub/Up/Paeth
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (p <- 0 until w * h)
        img.setRGB(p % w, p / w,
          ((rgb(3 * p) & 0xff) << 16) | ((rgb(3 * p + 1) & 0xff) << 8) | (rgb(3 * p + 2) & 0xff))
      val out = new ByteArrayOutputStream()
      assert(ImageIO.write(img, "png", out))
      val (s, back) = RealFormats.parsePngFull(out.toByteArray)
      assert(s.width == w && s.height == h)
      assert(back.sameElements(rgb), s"${w}x$h seed $seed")
    }
  }

  test("ImageIO reads our PNGs (spec conformance the other way)") {
    val rgb = raster(11, 16, 16)
    val png = RealFormats.writePng(16, 16, rgb)
    val img = ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img != null && img.getWidth == 16 && img.getHeight == 16)
    for (p <- 0 until 256) {
      val px = img.getRGB(p % 16, p / 16)
      assert(((px >> 16) & 0xff) == (rgb(3 * p) & 0xff), s"R at $p")
      assert(((px >> 8) & 0xff) == (rgb(3 * p + 1) & 0xff), s"G at $p")
      assert((px & 0xff) == (rgb(3 * p + 2) & 0xff), s"B at $p")
    }
  }

  test("corrupted PNGs fail loudly: flipped byte (CRC), truncation, signature") {
    val png = RealFormats.writePng(16, 16, raster(13, 16, 16))
    val flipped = png.clone()
    flipped(40) = (flipped(40) ^ 0x55).toByte // inside IDAT data → CRC mismatch
    intercept[IllegalArgumentException](RealFormats.parsePngFull(flipped))
    intercept[IllegalArgumentException](
      RealFormats.parsePngFull(java.util.Arrays.copyOf(png, png.length - 6)))
    val badSig = png.clone(); badSig(0) = 0
    intercept[IllegalArgumentException](RealFormats.parsePngFull(badSig))
  }

  // ----------------------------------------------------------------- JPEG --

  test("JPEG marker walk reports the frame header of real JDK-encoded streams") {
    for (seed <- 1 to 3; (w, h) <- Seq((16, 16), (48, 32))) {
      val jpg = RealFormats.writeJpeg(w, h, gradient(seed, w, h))
      val s = RealFormats.parseJpeg(jpg)
      assert(s.width == w && s.height == h, s"${w}x$h")
      assert(s.nComponents == 3 && s.precision == 8)
      assert(s.nDqt >= 1 && s.nDht >= 1 && s.nScanBytes > 0)
      assert(s.nSegments >= 5, "SOI-adjacent tables + frame + scan")
    }
  }

  test("JPEG marker walk classifies progressive (SOF2) streams, not quarantines") {
    // encode with ImageIO's progressive mode: the stream carries an SOF2
    // frame header and MULTIPLE SOS scans; the walker must read the frame
    // dims out of SOF2 and skip every scan by the stuffing rules
    import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}
    val w = 48; val h = 32
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(ImageWriteParam.MODE_DEFAULT)
    val out = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = gradient(7, w, h)
      var p = 0
      while (p < w * h) {
        img.setRGB(p % w, p / w, ((rgb(3 * p) & 0xff) << 16) |
          ((rgb(3 * p + 1) & 0xff) << 8) | (rgb(3 * p + 2) & 0xff))
        p += 1
      }
      writer.write(null, new IIOImage(img, null, null), param)
    } finally { writer.dispose(); ios.close() }
    val jpg = out.toByteArray
    // confirm the plant: an SOF2 marker is actually present
    assert((0 until jpg.length - 1).exists(i =>
      (jpg(i) & 0xff) == 0xff && (jpg(i + 1) & 0xff) == 0xc2), "not progressive")
    val s = RealFormats.parseJpeg(jpg)
    assert(s.width == w && s.height == h && s.nComponents == 3 && s.precision == 8)
    assert(s.nScanBytes > 0)
  }

  test("JPEG marker walk fails loudly on malformed streams") {
    intercept[IllegalArgumentException](RealFormats.parseJpeg(Array[Byte](1, 2, 3, 4)))
    val jpg = RealFormats.writeJpeg(16, 16, gradient(5, 16, 16))
    intercept[IllegalArgumentException](
      RealFormats.parseJpeg(java.util.Arrays.copyOf(jpg, jpg.length / 2)))
  }

  test("JPEG decode round-trips smooth content within lossy bounds") {
    val w = 32; val h = 32
    val rgb = gradient(21, w, h)
    val (dw, dh, back) = RealFormats.decodeJpeg(RealFormats.writeJpeg(w, h, rgb, 0.95f))
    assert(dw == w && dh == h)
    val maxErr = (0 until w * h * 3).map(j => math.abs((rgb(j) & 0xff) - (back(j) & 0xff))).max
    assert(maxErr <= 32, s"max channel error $maxErr for quality-0.95 smooth content")
    val meanErr = (0 until w * h * 3).map(j => math.abs((rgb(j) & 0xff) - (back(j) & 0xff))).sum
      .toDouble / (w * h * 3)
    assert(meanErr <= 8.0, s"mean channel error $meanErr")
  }

  test("dHash survives JPEG recompression (near-dup signal, not a checksum)") {
    for (seed <- 1 to 8) {
      val w = 64; val h = 64
      val rgb = gradient(seed, w, h)
      val orig = RealFormats.dHash64(w, h, rgb)
      val (_, _, back) = RealFormats.decodeJpeg(RealFormats.writeJpeg(w, h, rgb, 0.9f))
      val rec = RealFormats.dHash64(w, h, back)
      val ham = java.lang.Long.bitCount(orig._1 ^ rec._1) +
        java.lang.Long.bitCount(orig._2 ^ rec._2)
      assert(ham <= 10, s"seed $seed: recompression moved dHash by $ham of 64 bits")
    }
  }

  test("dHash construction here matches the pipeline's imageHashes") {
    val ids = Seq(0L, 3L, 6L, 9L)
    val assets = spark.createDataset(ids.map(MultimodalPipeline.imageAsset))
    val pipeline = imageHashes(assets).collect().map(h => h.assetId -> (h.hLo, h.hHi)).toMap
    ids.foreach { id =>
      val (w, h, rgb) = Codec.parsePpm(MultimodalPipeline.imageAsset(id).bytes)
      assert(RealFormats.dHash64(w, h, rgb) == pipeline(id), s"id $id")
    }
  }

  // ------------------------------------------------------ pipeline stages --

  test("decodePngStats measures the real corpus exactly (formula cross-check)") {
    val stats = decodePngStats(pngAssets(spark, "/root/testdata/sf0.001"))
      .collect().map(r => r.assetId -> r).toMap
    assert(stats.nonEmpty)
    stats.keys.take(10).foreach { id =>
      val rgb = MultimodalPipeline.realRaster(id)
      val exp = Array(0, 1, 2).map(c =>
        (0 until 256).map(p => rgb(3 * p + c) & 0xff).sum.toLong)
      val r = stats(id)
      assert(r.width == 16 && r.height == 16 && r.nChunks == 3)
      assert((r.sR, r.sG, r.sB) == ((exp(0), exp(1), exp(2))), s"id $id")
    }
  }

  test("jpegAudit quarantines malformed blobs as rows (never a failed job)") {
    val good = jpegAssets(spark, "/root/testdata/sf0.001").limit(3).collect().toSeq
    val bad = MediaAsset(999999L, "image", Array[Byte](0, 1, 2, 3), Map.empty)
    val rows = jpegAudit(spark.createDataset(good :+ bad))
      .collect().map(r => r.assetId -> r).toMap
    assert(rows(999999L).ok === false && rows(999999L).width == -1)
    good.foreach { a =>
      val r = rows(a.assetId)
      assert(r.ok && r.width == 16 && r.height == 16 && r.nComponents == 3 && r.precision == 8)
    }
  }
}
