package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Real lossy audio codec arm: IMA ADPCM inside a WAV container — the
  * audio sibling of [[RealFormats]]' PNG/JPEG image arms. Closes the
  * decode asymmetry the round-11 review called out: images were
  * decode-proven end-to-end while audio was container-walked only (mm15)
  * with mm8 fingerprinting the PCM passthrough.
  *
  * The codec is the INTERACTIVE MULTIMEDIA ASSOCIATION's 4-bit adaptive
  * differential PCM ("Recommended Practices for Enhancing Digital Audio
  * Compatibility in Multimedia Systems" rev 3.00, 1992): an adaptive
  * quantizer whose step size walks an 89-entry table driven by the
  * previous code's magnitude. The container is Microsoft WAVE format tag
  * 0x0011 (DVI/IMA ADPCM): 20-byte `fmt ` chunk with `cbSize=2` +
  * `samplesPerBlock`, the `fact` chunk the spec REQUIRES for compressed
  * formats (total sample count — byte length no longer determines it),
  * and `data` blocks of [4-byte header: predictor int16, step index
  * uint8, reserved] followed by low-nibble-first 4-bit codes. Both
  * directions are pure JVM, deterministic, and exact mirrors of each
  * other: the decoder's reconstruction IS the encoder's internal
  * predictor state, so decode(encode(x)) is the unique quantized
  * trajectory — what lets RealAudioSpec pin it and mm17 bound the
  * fingerprint drift against the exactly-proven PCM arm (the mm14
  * discipline applied to audio). */
object RealAudio {

  /** Step-index adaptation per 4-bit code (IMA 1992, table 2). */
  private val IndexTable: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  /** Quantizer step sizes (IMA 1992, table 3 — 89 entries). */
  private val StepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    158, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544,
    598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707,
    1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871,
    5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  private def clamp16(v: Int): Int = math.max(-32768, math.min(32767, v))

  /** Dequantized delta for one 4-bit code at one step — the shared
    * reconstruction both sides run (the (2·mag+1)·step/8 staircase as the
    * spec's shift-add form, bit-exact to real decoders). */
  private def delta(step: Int, nib: Int): Int = {
    var d = step >> 3
    if ((nib & 4) != 0) d += step
    if ((nib & 2) != 0) d += step >> 1
    if ((nib & 1) != 0) d += step >> 2
    d
  }

  private def blockBytes(spb: Int): Int = 4 + (spb - 1 + 1) / 2

  /** Encode mono PCM16 as an IMA-ADPCM WAV. Samples split into blocks of
    * `spb`; each block's first sample is stored verbatim in the header
    * with the quantizer's current step index, the remaining spb−1 as
    * 4-bit codes, low nibble first. `samples.length` must be a whole
    * number of blocks (a real encoder pads the tail; this corpus is
    * generated in whole blocks, and silent padding would leak into the
    * energy fingerprint). */
  def writeWavAdpcm(sampleRate: Int, samples: Array[Short], spb: Int = 256): Array[Byte] = {
    require(spb >= 2 && samples.nonEmpty && samples.length % spb == 0,
      s"${samples.length} samples not whole $spb-sample blocks")
    val nBlocks = samples.length / spb
    val ba = blockBytes(spb)
    val dataLen = nBlocks * ba
    val buf = ByteBuffer.allocate(12 + 28 + 12 + 8 + dataLen)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes(StandardCharsets.US_ASCII))
      .putInt(4 + 28 + 12 + 8 + dataLen)
      .put("WAVE".getBytes(StandardCharsets.US_ASCII))
    buf.put("fmt ".getBytes(StandardCharsets.US_ASCII)).putInt(20)
      .putShort(0x11) // wFormatTag: DVI/IMA ADPCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate.toLong.toInt * ba / spb) // nAvgBytesPerSec
      .putShort(ba.toShort) // nBlockAlign
      .putShort(4) // wBitsPerSample
      .putShort(2) // cbSize
      .putShort(spb.toShort) // wSamplesPerBlock
    buf.put("fact".getBytes(StandardCharsets.US_ASCII)).putInt(4)
      .putInt(samples.length)
    buf.put("data".getBytes(StandardCharsets.US_ASCII)).putInt(dataLen)
    var index = 0
    var b = 0
    while (b < nBlocks) {
      val base = b * spb
      var pred = samples(base).toInt
      buf.putShort(pred.toShort).put(index.toByte).put(0.toByte)
      var k = 1
      var half = 0 // pending low nibble (-1 = none)
      var hasHalf = false
      while (k < spb) {
        val step = StepTable(index)
        var diff = samples(base + k) - pred
        var nib = 0
        if (diff < 0) { nib = 8; diff = -diff }
        if (diff >= step) { nib |= 4; diff -= step }
        if (diff >= (step >> 1)) { nib |= 2; diff -= step >> 1 }
        if (diff >= (step >> 2)) nib |= 1
        val d = delta(step, nib)
        pred = clamp16(if ((nib & 8) != 0) pred - d else pred + d)
        index = math.max(0, math.min(88, index + IndexTable(nib)))
        if (!hasHalf) { half = nib; hasHalf = true }
        else { buf.put((half | (nib << 4)).toByte); hasHalf = false }
        k += 1
      }
      if (hasHalf) buf.put(half.toByte) // pad nibble 0 in the high half
      b += 1
    }
    buf.array()
  }

  /** Decode an IMA-ADPCM WAV back to (sampleRate, PCM16): RIFF chunk walk
    * (unknown chunks skipped with even padding, as a real demuxer must),
    * format tag 0x0011 and mono enforced, `fact`'s sample count
    * cross-checked against the block geometry, per-block header
    * predictor/index driving the same adaptive staircase as the encoder.
    * Loud failure on any violation — callers quarantine. */
  def parseWavAdpcm(bytes: Array[Byte]): (Int, Array[Short]) = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4); buf.get(b)
      new String(b, StandardCharsets.US_ASCII)
    }
    require(bytes.length >= 12 && fourcc() == "RIFF", "not a RIFF file")
    buf.getInt
    require(fourcc() == "WAVE", "not a WAVE file")
    var sampleRate = -1
    var spb = -1
    var ba = -1
    var factSamples = -1
    var data: Array[Byte] = null
    while (buf.remaining() >= 8) {
      val id = fourcc()
      val len = buf.getInt
      require(len >= 0 && buf.remaining() >= len, s"truncated '$id' chunk")
      val next = buf.position() + len + (len & 1) // RIFF even padding
      id match {
        case "fmt " =>
          require(len >= 20, "fmt chunk too short for a compressed format")
          val tag = buf.getShort
          require(tag == 0x11, f"not IMA ADPCM (fmt tag 0x$tag%04x)")
          require(buf.getShort == 1, "not mono")
          sampleRate = buf.getInt
          buf.getInt // nAvgBytesPerSec (informational)
          ba = buf.getShort & 0xffff
          require((buf.getShort & 0xffff) == 4, "not 4-bit ADPCM")
          require((buf.getShort & 0xffff) >= 2, "missing samplesPerBlock")
          spb = buf.getShort & 0xffff
          require(spb >= 2 && ba == blockBytes(spb),
            s"block align $ba inconsistent with $spb samples/block")
        case "fact" =>
          require(len >= 4, "malformed fact")
          factSamples = buf.getInt
        case "data" =>
          data = new Array[Byte](len)
          buf.get(data)
        case _ => () // skip unknown chunks (LIST, cue , ...)
      }
      buf.position(math.min(next, bytes.length))
    }
    require(sampleRate > 0 && spb > 0, "missing fmt chunk")
    require(data != null, "missing data chunk")
    require(factSamples >= 0, "missing fact chunk (required for ADPCM)")
    require(data.length % ba == 0, s"data ${data.length} not whole $ba-byte blocks")
    val nBlocks = data.length / ba
    require(factSamples == nBlocks * spb,
      s"fact $factSamples != $nBlocks blocks x $spb samples")
    val out = new Array[Short](factSamples)
    var b = 0
    while (b < nBlocks) {
      val base = b * ba
      val hdr = ByteBuffer.wrap(data, base, 4).order(ByteOrder.LITTLE_ENDIAN)
      var pred: Int = hdr.getShort.toInt
      var index: Int = hdr.get() & 0xff
      require(index <= 88, s"step index $index out of table")
      out(b * spb) = pred.toShort
      var k = 1
      while (k < spb) {
        val byte = data(base + 4 + (k - 1) / 2) & 0xff
        val nib = if ((k - 1) % 2 == 0) byte & 0xf else byte >>> 4
        val step = StepTable(index)
        val d = delta(step, nib)
        pred = clamp16(if ((nib & 8) != 0) pred - d else pred + d)
        index = math.max(0, math.min(88, index + IndexTable(nib)))
        out(b * spb + k) = pred.toShort
        k += 1
      }
      b += 1
    }
    (sampleRate, out)
  }
}
