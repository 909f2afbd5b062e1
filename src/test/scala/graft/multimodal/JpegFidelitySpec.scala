package graft.multimodal

import graft.SparkSpec

/** mm14's verdict-bound contract, pinned from BOTH sides: the real JDK
  * JPEG encode→decode cycle keeps every corpus raster's dHash within the
  * drift bound (the lossy-but-right side: measured mean 5.9, max 16 over
  * 2000 noise rasters), while a structurally broken decode (the planted
  * transpose — what a row-order / dimension bug in any codec stage
  * produces) lands in the unrelated-content regime (median 30, thin tail
  * to 16) almost everywhere above it. The distributions overlap at 16–20,
  * so the bound is placed at the real arm's max + 4 bits rather than in an
  * empty gap; the wrong side is asserted at ≥ 90% of rasters, which is
  * what "verdicts flip corpus-wide" needs. */
class JpegFidelitySpec extends SparkSpec {

  /** mm14's bound (MultimodalQueries.JpegMaxDrift) — re-pinned literally so
    * a drive-by change to either side breaks a test, not just the gate. */
  private val Bound = 20

  private def drift(a: (Long, Long), b: (Long, Long)): Int =
    java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)

  private def imageIds(n: Int): Seq[Long] = (0L until n.toLong * 3 by 3)

  test("whole-corpus-scale drift stays under the bound (noise = JPEG's worst case)") {
    // 2000 image ids covers every asset the sf0.1 verify/bench surface
    // decodes, on md5 noise — the content class lossy codecs handle worst
    val drifts = imageIds(2000).map { id =>
      val rgb = MultimodalPipeline.realRaster(id)
      val ref = RealFormats.dHash64(16, 16, rgb)
      val (_, _, back) = RealFormats.decodeJpeg(RealFormats.writeJpeg(16, 16, rgb))
      drift(ref, RealFormats.dHash64(16, 16, back))
    }
    val max = drifts.max
    assert(max <= Bound, s"max jpeg dHash drift $max exceeds the mm14 bound $Bound")
    // the bound is not vacuous: real drift exists (lossy, not a checksum)
    assert(drifts.sum > 0, "zero total drift — jpeg path suspiciously lossless")
  }

  test("a structurally broken decode violates the bound corpus-wide (the bound bites)") {
    // transpose = the canonical row-order/dimension decode bug; its dHash
    // behaves like unrelated content (~32 of 64 bits)
    def transposed(rgb: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](768)
      for (y <- 0 until 16; x <- 0 until 16; c <- 0 until 3)
        out(3 * (x * 16 + y) + c) = rgb(3 * (y * 16 + x) + c)
      out
    }
    val ids = imageIds(200)
    val over = ids.count { id =>
      val rgb = MultimodalPipeline.realRaster(id)
      drift(RealFormats.dHash64(16, 16, rgb),
        RealFormats.dHash64(16, 16, transposed(rgb))) > Bound
    }
    assert(over >= ids.size * 9 / 10,
      s"only $over/${ids.size} transposed rasters exceed the bound — no separation margin")
  }

  test("jpeg_image rows live in media_fp beside the png arm, one per image doc") {
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.001"
    graft.operators.MultimodalQueries.warm(spark, d)
    val fp = graft.build.DerivedCache.existing(spark, d, graft.build.DocTables.MediaFp)
    val byMod = fp.groupBy(col("modality")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byMod("jpeg_image") == byMod("png_image"),
      s"jpeg arm must cover exactly the png arm's documents: $byMod")
    assert(byMod("jpeg_image") == byMod("image"), s"and the PPM arm's: $byMod")
  }
}
