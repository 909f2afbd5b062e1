package graft.multimodal

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import graft.SparkSpec
import graft.multimodal.RealContainers._

/** MP3 frame-sync walker + MP4/ISO-BMFF box walker: closed-form round
  * trips against the writer contract, version-1 full-box handling, and
  * the quarantine discipline (planted corruption fails loudly in the
  * parser, becomes `ok = false` rows at the audit level — never a failed
  * job). The mm15/mm16 hash oracles pin the corpus-wide values; these pin
  * the byte-level semantics. */
class RealContainersSpec extends SparkSpec {

  // ------------------------------------------------------------------ MP3 --

  test("MP3 round trip: frame chain, tables, Xing match the closed form") {
    for ((nf, br, sr, id3) <- Seq((2, 1, 0, 16), (5, 14, 2, 31), (6, 8, 1, 20))) {
      val bytes = writeMp3(s"t#$nf", nf, br, sr, id3)
      val s = parseMp3(bytes)
      val kbps = Mp3BitrateKbps(br)
      val rate = Mp3SampleRate(sr)
      val expectBytes = (0 until nf).map(f => mp3FrameLen(kbps, rate, f % 2)).sum
      assert(s.nFrames == nf && s.sampleRate == rate && s.bitrateKbps == kbps)
      assert(s.nStreamBytes == expectBytes)
      assert(10L + id3 + s.nStreamBytes == bytes.length,
        "ID3 header+payload + frame stream must tile the blob exactly")
      assert(s.nSamples == nf.toLong * Mp3SamplesPerFrame)
      assert(s.xingFrames == nf && s.xingBytes == expectBytes)
    }
  }

  test("MP3 walker reads an 'Info' (CBR) header too") {
    val bytes = writeMp3("info", 3, 5, 0, 16)
    // first frame payload: side info at +4, magic at +4+17
    val off = 10 + 16 + 4 + 17
    System.arraycopy("Info".getBytes(StandardCharsets.US_ASCII), 0, bytes, off, 4)
    val s = parseMp3(bytes)
    assert(s.xingFrames == 3)
  }

  test("MP3 corruption fails loudly: sync, bitrate index, truncation, mid-stream rate") {
    val good = writeMp3("bad", 4, 6, 1, 16)
    // flipped sync byte on frame 0
    val b1 = good.clone(); b1(10 + 16) = 0x12
    intercept[IllegalArgumentException](parseMp3(b1))
    // bad bitrate index (0xF) in frame 0 header
    val b2 = good.clone(); b2(10 + 16 + 2) = 0xf4.toByte
    intercept[IllegalArgumentException](parseMp3(b2))
    // truncated final frame
    intercept[IllegalArgumentException](parseMp3(good.dropRight(3)))
    // ID3 size pointing past the end
    val b3 = good.clone(); b3(9) = 0x7f
    intercept[IllegalArgumentException](parseMp3(b3.take(40)))
  }

  test("mp3Audit quarantines malformed blobs as rows (never a failed job)") {
    import spark.implicits._
    val good = MultimodalPipeline.MediaAsset(1L, "audio", writeMp3("q", 3, 4, 0, 16), Map())
    val bad = MultimodalPipeline.MediaAsset(2L, "audio", Array[Byte](1, 2, 3), Map())
    val rows = MultimodalPipeline.mp3Audit(Seq(good, bad).toDS())
      .collect().map(r => r.assetId -> r.ok).toMap
    assert(rows == Map(1L -> true, 2L -> false))
  }

  // ------------------------------------------------------------------ MP4 --

  test("MP4 round trip: box census, durations, sample mass match the closed form") {
    for (n <- Seq(2, 3, 4, 7)) {
      val bytes = writeMp4(s"v#$n", n)
      // the closed form the mm16 oracle states
      assert(bytes.length == 522 + 196 * n, s"total bytes for n=$n")
      val s = parseMp4(bytes)
      assert(s.nBoxes == 19 && s.majorBrand == "isom")
      assert(s.timescale == Mp4Timescale && s.duration == n * Mp4SampleDelta)
      assert(s.nSamples == n && s.sampleBytes == n.toLong * Mp4SampleBytes)
      assert(s.mdatBytes == s.sampleBytes && s.nBytes == bytes.length)
    }
  }

  test("MP4 walker handles version-1 mvhd/mdhd field widths") {
    // hand-build a minimal file with 64-bit times: ftyp + moov(mvhd v1,
    // trak(mdia(mdhd v1, minf(stbl(stsz, stco))))) + mdat
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + payload.length)
      b.putInt(8 + payload.length).put(typ.getBytes(StandardCharsets.US_ASCII))
        .put(payload).array()
    }
    val ftyp = box("ftyp", ByteBuffer.allocate(16)
      .put("isom".getBytes(StandardCharsets.US_ASCII)).putInt(0)
      .put("isom".getBytes(StandardCharsets.US_ASCII))
      .put("mp42".getBytes(StandardCharsets.US_ASCII)).array())
    def fullV1(ts: Int, dur: Long): Array[Byte] = ByteBuffer.allocate(32)
      .putInt(0x01000000) // version 1
      .putLong(0).putLong(0) // 64-bit creation/modification
      .putInt(ts).putLong(dur).array()
    val mvhd = box("mvhd", fullV1(90000, 1234L))
    val mdhd = box("mdhd", fullV1(90000, 1234L))
    val stsz = box("stsz", ByteBuffer.allocate(16)
      .putInt(0).putInt(5).putInt(2).array()) // fixed 5-byte samples ×2
    val preLen = // offsets: everything before the mdat payload
      ftyp.length + 8 /*moov*/ + mvhd.length + 8 /*trak*/ + 8 /*mdia*/ +
        mdhd.length + 8 /*minf*/ + 8 /*stbl*/ + stsz.length + 20 /*stco*/ + 8
    val stco = box("stco", ByteBuffer.allocate(12)
      .putInt(0).putInt(1).putInt(preLen).array())
    val stbl = box("stbl", stsz ++ stco)
    val minf = box("minf", stbl)
    val mdia = box("mdia", mdhd ++ minf)
    val trak = box("trak", mdia)
    val moov = box("moov", mvhd ++ trak)
    val mdat = box("mdat", new Array[Byte](10))
    val s = parseMp4(ftyp ++ moov ++ mdat)
    assert(s.timescale == 90000 && s.duration == 1234)
    assert(s.nSamples == 2 && s.sampleBytes == 10L)
  }

  test("MP4 walker reads the §4.2 size escapes: 64-bit largesize, size==0 to-end") {
    val good = writeMp4("esc", 3)
    val ref = parseMp4(good)
    val idx = indexOfBox(good, "mdat")
    // size==0: mdat is the last top-level box, so "to end of enclosing
    // scope" resolves to end-of-file — identical structure must come back
    val b0 = good.clone(); ByteBuffer.wrap(b0).putInt(idx, 0)
    assert(parseMp4(b0) == ref)
    // size==1: 16-byte header with the 64-bit largesize after the fourcc
    // (what any muxer emits for mdat > 4 GiB); the payload shifts +8, so
    // the stco chunk offset is patched to keep the demuxer check honest
    val payload = good.drop(idx + 8)
    val hdr16 = ByteBuffer.allocate(16).putInt(1)
      .put("mdat".getBytes(StandardCharsets.US_ASCII))
      .putLong(16L + payload.length).array()
    val b1 = good.take(idx) ++ hdr16 ++ payload
    val stcoIdx = indexOfBox(b1, "stco")
    val oldOff = ByteBuffer.wrap(b1).getInt(stcoIdx + 16)
    ByteBuffer.wrap(b1).putInt(stcoIdx + 16, oldOff + 8)
    val s1 = parseMp4(b1)
    assert(s1.nSamples == ref.nSamples && s1.sampleBytes == ref.sampleBytes &&
      s1.mdatBytes == ref.mdatBytes && s1.nBytes == ref.nBytes + 8)
    // a largesize below the 16-byte header is malformed — loud failure
    val b2 = b1.clone()
    ByteBuffer.wrap(b2).putLong(indexOfBox(b2, "mdat") + 8, 8L)
    intercept[IllegalArgumentException](parseMp4(b2))
  }

  test("MP4 corruption fails loudly: box size, stsz/mdat disagreement, stco offset") {
    val good = writeMp4("bad4", 3)
    // oversize top-level box
    val b1 = good.clone(); ByteBuffer.wrap(b1).putInt(0, 1 << 24)
    intercept[IllegalArgumentException](parseMp4(b1))
    // shrink mdat payload claim: stsz sum no longer equals mdat bytes
    val b2 = good.dropRight(1)
    intercept[IllegalArgumentException](parseMp4(b2))
    // corrupt one stsz entry (find the stsz box, bump a sample size)
    val b3 = good.clone()
    val idx = indexOfBox(b3, "stsz")
    ByteBuffer.wrap(b3).putInt(idx + 20, Mp4SampleBytes + 1)
    intercept[IllegalArgumentException](parseMp4(b3))
  }

  private def indexOfBox(bytes: Array[Byte], typ: String): Int = {
    val t = typ.getBytes(StandardCharsets.US_ASCII)
    (0 until bytes.length - 8).find(i =>
      bytes(i + 4) == t(0) && bytes(i + 5) == t(1) &&
        bytes(i + 6) == t(2) && bytes(i + 7) == t(3)).get
  }

  test("mp4Audit quarantines malformed blobs as rows (never a failed job)") {
    import spark.implicits._
    val good = MultimodalPipeline.MediaAsset(1L, "video", writeMp4("q4", 2), Map())
    val bad = MultimodalPipeline.MediaAsset(2L, "video", Array[Byte](0, 0, 0, 9), Map())
    val rows = MultimodalPipeline.mp4Audit(Seq(good, bad).toDS())
      .collect().map(r => r.assetId -> r.ok).toMap
    assert(rows == Map(1L -> true, 2L -> false))
  }
}
