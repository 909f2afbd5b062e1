package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

import graft.SparkSpec

/** The real lossy audio arm (mm17): IMA-ADPCM encode→decode round trips
  * through a conformant format-tag-0x11 WAV, malformed containers fail
  * loudly, the fingerprint drift stays under mm17's bound corpus-wide
  * while a structurally broken decode violates it on a large fraction of
  * assets, and the adpcm_audio rows live in media_fp beside the PCM arm —
  * the JpegFidelitySpec contract applied to audio. */
class RealAudioSpec extends SparkSpec {

  /** mm17's bound (MultimodalQueries.AdpcmMaxDrift) — re-pinned literally
    * so a drive-by change to either side breaks a test, not just the
    * gate. */
  private val Bound = 16

  private def fp(samples: Array[Short]): Long =
    MultimodalPipeline.energyFingerprint(0L, samples, 8).fp

  private def audioIds(n: Int): Seq[Long] = (1L until n.toLong * 3 by 3)

  test("container round trip: geometry, sample rate, per-block headers") {
    val samples = Codec.contentSamples("rt#aud", 512) // two 256-sample blocks
    val wav = RealAudio.writeWavAdpcm(8000, samples)
    // closed-form size: RIFF(12) + fmt(8+20) + fact(8+4) + data hdr(8) +
    // 2 blocks × (4 + 128)
    assert(wav.length == 12 + 28 + 12 + 8 + 2 * 132, s"got ${wav.length}")
    val (rate, back) = RealAudio.parseWavAdpcm(wav)
    assert(rate == 8000 && back.length == 512)
    // block-leading samples are stored verbatim — exact by construction
    assert(back(0) == samples(0) && back(256) == samples(256))
  }

  test("a constant signal decodes exactly (the staircase sits still)") {
    val samples = Array.fill[Short](256)(1234)
    val (_, back) = RealAudio.parseWavAdpcm(RealAudio.writeWavAdpcm(8000, samples))
    assert(back.toSeq == samples.toSeq)
  }

  test("unknown RIFF chunks are skipped like a real demuxer") {
    val wav = RealAudio.writeWavAdpcm(8000, Codec.contentSamples("sk#aud", 256))
    // splice a LIST chunk between fmt and fact (offset 12 + 28)
    val extra = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
      .put("LIST".getBytes("US-ASCII")).putInt(4)
      .put("INFO".getBytes("US-ASCII")).array()
    val spliced = wav.take(40) ++ extra ++ wav.drop(40)
    val (_, back) = RealAudio.parseWavAdpcm(spliced)
    assert(back.length == 256)
  }

  test("malformed containers fail loudly: tag, fact, geometry, index, truncation") {
    val good = RealAudio.writeWavAdpcm(8000, Codec.contentSamples("bad#aud", 256))
    def mutated(f: Array[Byte] => Unit): Array[Byte] = {
      val b = good.clone(); f(b); b
    }
    // PCM tag on ADPCM data (offset 20 = fmt payload start)
    intercept[IllegalArgumentException](RealAudio.parseWavAdpcm(
      mutated(b => ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).putShort(20, 1))))
    // fact count disagrees with block geometry (fact payload at 48)
    intercept[IllegalArgumentException](RealAudio.parseWavAdpcm(
      mutated(b => ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).putInt(48, 255))))
    // step index beyond the 89-entry table (block header byte 2, data at 60)
    intercept[IllegalArgumentException](RealAudio.parseWavAdpcm(
      mutated(b => b(60 + 2) = 89.toByte)))
    // truncated final block
    intercept[IllegalArgumentException](RealAudio.parseWavAdpcm(good.dropRight(1)))
    // partial-block encode is refused outright
    intercept[IllegalArgumentException](
      RealAudio.writeWavAdpcm(8000, Codec.contentSamples("bad#aud", 255)))
  }

  test("whole-corpus-scale drift stays under the bound (noise = ADPCM's worst case)") {
    // 2000 audio ids covers every asset the sf0.1 verify/bench surface
    // fingerprints, on md5 noise — the content the adaptive quantizer
    // tracks worst (it never settles)
    val drifts = audioIds(2000).map { id =>
      val samples = Codec.contentSamples(s"$id#aud", 256)
      val (_, back) = RealAudio.parseWavAdpcm(RealAudio.writeWavAdpcm(8000, samples))
      java.lang.Long.bitCount(fp(samples) ^ fp(back))
    }
    val max = drifts.max
    assert(max <= Bound, s"max adpcm fingerprint drift $max exceeds the mm17 bound $Bound")
    // the bound is not vacuous: real drift exists (lossy, not a passthrough)
    assert(drifts.sum > 0, "zero total drift — adpcm path suspiciously lossless")
  }

  test("a structurally broken decode violates the bound on a corpus-wide fraction") {
    // byte-swapped PCM16 = the canonical endianness decode bug; its window
    // energies decorrelate and the fingerprint behaves like unrelated
    // content (center ~16 of 32 bits). The distributions overlap, so the
    // wrong side is asserted at ≥ 30% of assets — thousands of flipped
    // verdicts corpus-wide, and ONE flip breaks the mm17 oracle hash.
    val ids = audioIds(500)
    val over = ids.count { id =>
      val samples = Codec.contentSamples(s"$id#aud", 256)
      val swapped = samples.map(java.lang.Short.reverseBytes)
      java.lang.Long.bitCount(fp(samples) ^ fp(swapped)) > Bound
    }
    assert(over >= ids.size * 3 / 10,
      s"only $over/${ids.size} byte-swapped streams exceed the bound — no separation")
  }

  test("adpcm_audio rows live in media_fp beside the PCM arm, one per audio doc") {
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.001"
    graft.operators.MultimodalQueries.warm(spark, d)
    val fpTable = graft.build.DerivedCache.existing(spark, d, graft.build.DocTables.MediaFp)
    val byMod = fpTable.groupBy(col("modality")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byMod("adpcm_audio") == byMod("audio"),
      s"adpcm arm must cover exactly the PCM arm's documents: $byMod")
  }

  test("mm17 verdicts all true on the driver corpus (the real decode is inside the bound)") {
    val rows = graft.operators.MultimodalQueries
      .queries("mm17_adpcm_fidelity")(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty && rows.forall(_.getBoolean(2)),
      s"${rows.count(!_.getBoolean(2))} of ${rows.length} verdicts false")
  }
}
