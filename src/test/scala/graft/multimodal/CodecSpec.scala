package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Round-trip + validation tests for the real pure-JVM codecs (seeded
  * exhaustive-ish sweeps — deterministic, no Spark session needed). */
class CodecSpec extends AnyFunSuite {

  test("PPM round-trip is byte-exact for arbitrary dimensions and pixels") {
    val rng = new scala.util.Random(42)
    for (_ <- 1 to 50) {
      val w = rng.nextInt(32) + 1
      val h = rng.nextInt(32) + 1
      val rgb = Array.fill(w * h * 3)(rng.nextInt(256).toByte)
      val (pw, ph, prgb) = Codec.parsePpm(Codec.writePpm(w, h, rgb))
      assert(pw == w && ph == h)
      assert(java.util.Arrays.equals(prgb, rgb))
    }
  }

  test("PPM parser rejects malformed input") {
    intercept[IllegalArgumentException](Codec.parsePpm("P5\n1 1\n255\nx".getBytes))
    intercept[IllegalArgumentException](
      Codec.parsePpm(Codec.writePpm(2, 2, new Array[Byte](12)).dropRight(1)))
  }

  test("WAV round-trip preserves sample rate and PCM16 samples exactly") {
    val rng = new scala.util.Random(7)
    for (_ <- 1 to 50) {
      val rate = rng.nextInt(40001) + 8000
      val samples = Array.fill(rng.nextInt(500) + 1)(rng.nextInt(65536).toShort)
      val (pRate, pSamples) = Codec.parseWav(Codec.writeWav(rate, samples))
      assert(pRate == rate)
      assert(java.util.Arrays.equals(pSamples, samples))
    }
  }

  test("WAV parser skips unknown chunks like a real demuxer") {
    val base = Codec.writeWav(8000, Array[Short](1, -2, 3))
    // splice an unknown 3-byte chunk (padded to 4) between WAVE and fmt
    val junk = "LIST".getBytes ++ Array[Byte](3, 0, 0, 0, 7, 7, 7, 0)
    val spliced = base.take(12) ++ junk ++ base.drop(12)
    // fix the RIFF size field
    val bb = java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, spliced.length - 8)
    val (rate, samples) = Codec.parseWav(spliced)
    assert(rate == 8000 && samples.toSeq == Seq[Short](1, -2, 3))
  }

  test("GRFV container indexes frames exactly") {
    val frames = (0 until 5).map(i => Codec.writePpm(2, 2, Array.fill(12)(i.toByte)))
    val container = Codec.writeGrfv(frames)
    assert(Codec.grfvFrameCount(container) == 5)
    (0 until 5).foreach { i =>
      val got = Codec.readGrfvFrame(container, i)
      assert(java.util.Arrays.equals(got, frames(i)),
        s"frame $i: got=${got.toSeq} exp=${frames(i).toSeq}")
    }
    intercept[IllegalArgumentException](Codec.readGrfvFrame(container, 5))
    intercept[IllegalArgumentException](Codec.grfvFrameCount("nope".getBytes ++ container))
  }

  test("content generation is deterministic and block-chained") {
    val a = Codec.contentBytes("k", 40)
    assert(java.util.Arrays.equals(a, Codec.contentBytes("k", 40)))
    assert(!java.util.Arrays.equals(a, Codec.contentBytes("k2", 40)))
    // prefix property: longer requests extend, never reshuffle
    assert(Codec.contentBytes("k", 16).toSeq == a.take(16).toSeq)
    val s = Codec.contentSamples("k", 8)
    val raw = Codec.contentBytes("k", 16)
    (0 until 8).foreach { k =>
      val expected = (((raw(2 * k) & 0xff) << 8 | (raw(2 * k + 1) & 0xff)) - 32768).toShort
      assert(s(k) == expected)
    }
  }
}
