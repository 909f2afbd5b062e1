package graft.multimodal

import graft.SparkSpec
import graft.multimodal.MultimodalPipeline._

class MultimodalPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val assets = realMediaAssets(spark, dir)

  test("asset schema: binary payload + typed metadata") {
    val schema = assets.schema
    assert(schema("bytes").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "map")
    assert(assets.count() == 500)
  }

  test("real decode emits one frame per image/audio asset, sampled frames per video") {
    val frames = decode(assets, stride = 2).cache()
    val perAsset = frames.groupByKey(_.assetId).count().collect().toMap
    val metas = assets.collect().map(a => a.assetId -> a).toMap
    metas.values.foreach { a =>
      val expected = if (a.modality == "video")
        frameIndices(a.meta, 2).size.toLong else 1L
      assert(perAsset(a.assetId) == expected,
        s"asset ${a.assetId} (${a.modality}): ${perAsset(a.assetId)} != $expected")
    }
    frames.collect().foreach { f =>
      f.modality match {
        case "image" => assert(f.width == 16 && f.height == 16 && f.vals.length == 768)
        case "audio" => assert(f.width == 256 && f.height == 1 && f.vals.length == 256)
        case _ => assert(f.width == 8 && f.height == 8 && f.vals.length == 192)
      }
    }
  }

  test("decode recovers the exact generated content through the real containers") {
    val byId = decode(assets).collect().map(f => (f.assetId, f.frameIdx) -> f).toMap
    // PNG: zlib round-trip must reproduce the '#img' raster byte-for-byte
    val img = byId((0L, 0))
    assert(img.vals.toSeq == Codec.contentBytes("0#img", 768).map(_ & 0xff).toSeq)
    // WAV: PCM16 samples == the '#aud' sample chain
    val aud = byId((1L, 0))
    assert(aud.vals.toSeq == Codec.contentSamples("1#aud", 256).map(_.toInt).toSeq)
    // GRFV frame 2 of asset 2 == its '#vid#2' raster
    if (byId.contains((2L, 2)))
      assert(byId((2L, 2)).vals.toSeq ==
        Codec.contentBytes("2#vid#2", 192).map(_ & 0xff).toSeq)
  }

  test("resize box-pools the real grid; bucketFeatures is one exact float division") {
    // hand-built 4×2 RGB frame: channel ch pixel (x,y) value = base pattern
    val vals = Array.tabulate(4 * 2 * 3)(identity) // 0..23
    val f = DecodedFrame(9L, "image", 0, 4, 2, 3, vals)
    val pooled = resize(Seq(f).toDS(), 2).collect().head
    assert(pooled.width == 2 && pooled.height == 1)
    // cell (X=0,Y=0,ch=0): pixels (0,0),(1,0),(0,1),(1,1) ch0 = 0,3,12,15 -> 30/4 = 7
    assert(pooled.vals(0) == 7)
    // audio pool: 8 samples -> 2 pooled by 4, truncating toward zero
    val a = DecodedFrame(9L, "audio", 0, 8, 1, 1, Array(-1, -1, -1, -4, 1, 1, 1, 4))
    val pa = resize(Seq(a).toDS(), 2).collect().head
    assert(pa.vals.toSeq == Seq(-1, 1), s"got ${pa.vals.toSeq}") // -7/4 = -1 (truncating), 7/4 = 1
    // bucketFeatures: 16 vals of 128 -> every feature exactly 0; audio scale
    val z = DecodedFrame(9L, "image", 0, 16, 1, 1, Array.fill(16)(128))
    assert(bucketFeatures(z).toSeq == Seq.fill(16)(0.0f))
    val s1 = DecodedFrame(9L, "audio", 0, 16, 1, 1, Array.fill(16)(16384))
    assert(bucketFeatures(s1).toSeq == Seq.fill(16)(0.5f))
  }

  test("decode is deterministic (real codecs)") {
    val a = decode(assets).collect().sortBy(f => (f.assetId, f.frameIdx))
    val b = decode(assets).collect().sortBy(f => (f.assetId, f.frameIdx))
    assert(a.map(_.vals.toSeq).toSeq == b.map(_.vals.toSeq).toSeq)
  }

  test("image tiles partition the raster and recompose whole-image sums") {
    val ca = codecAssets(spark, dir)
    val tiles = decodeImageTiles(ca, 2).collect()
    assert(tiles.nonEmpty)
    val byAsset = tiles.groupBy(_.assetId)
    byAsset.values.foreach { ts =>
      assert(ts.map(_.tileIdx).sorted.toSeq == (0 until 4))
      assert(ts.forall(t => t.w == 8 && t.h == 8))
    }
    // recomposition: tile channel sums fold back to mm3's whole-image row
    val whole = decodeCodec(ca).filter(f => f.width == 16 && f.height == 16)
      .collect().map(f => f.assetId -> f).toMap
    assert(whole.keySet == byAsset.keySet)
    byAsset.foreach { case (id, ts) =>
      assert(ts.map(_.sR).sum == whole(id).s1, s"R mismatch for $id")
      assert(ts.map(_.sG).sum == whole(id).s2, s"G mismatch for $id")
      assert(ts.map(_.sB).sum == whole(id).s3, s"B mismatch for $id")
    }
    // an indivisible grid fails loudly, never silently crops
    val err = intercept[org.apache.spark.SparkException] {
      decodeImageTiles(ca, 3).collect()
    }
    assert(err.getMessage.contains("tile grid") ||
      Option(err.getCause).exists(_.getMessage.contains("tile grid")))
  }

  test("WAV windows partition the stream and recompose whole-file stats") {
    val ca = codecAssets(spark, dir)
    val windows = decodeWavWindows(ca, 64).collect()
    assert(windows.nonEmpty)
    val byAsset = windows.groupBy(_.assetId)
    // windows tile the 256-sample stream: contiguous indexes, 64 each
    byAsset.values.foreach { ws =>
      assert(ws.map(_.winIdx).sorted.toSeq == (0 until ws.length).toSeq)
      assert(ws.forall(_.nSamples == 64) && ws.map(_.nSamples).sum == 256)
    }
    // recomposition: window stats fold back to the whole-file decode (mm3's
    // audio row: s1 = sum, s2 = max, s3 = min)
    val whole = decodeCodec(ca).filter(_.width == 256).collect()
      .map(f => f.assetId -> f).toMap
    assert(whole.keySet == byAsset.keySet)
    byAsset.foreach { case (id, ws) =>
      assert(ws.map(_.sSum).sum == whole(id).s1, s"sum mismatch for $id")
      assert(ws.map(_.sMax).max == whole(id).s2, s"max mismatch for $id")
      assert(ws.map(_.sMin).min == whole(id).s3, s"min mismatch for $id")
      assert(ws.forall(_.energy >= 0))
    }
    // a short tail window is handled (non-multiple window size)
    val odd = decodeWavWindows(ca, 60).collect().groupBy(_.assetId)
    odd.values.foreach { ws =>
      assert(ws.map(_.nSamples).sum == 256)
      assert(ws.maxBy(_.winIdx).nSamples == 256 % 60)
    }
  }

  test("frameDeltas: planted repeat is no cut, planted hard cut maxes out") {
    // frames [A, A, B] with A = all 0x00 and B = all 0xff: the repeat pair
    // has SAD 0 (no cut at ANY threshold) and the A->B pair is the maximal
    // cut (192*255); a real corpus sits between the two
    val w = 8; val h = 8
    val black = Array.fill[Byte](w * h * 3)(0)
    val white = Array.fill[Byte](w * h * 3)(0xff.toByte)
    val planted = Seq(MediaAsset(7L, "video",
      Codec.writeGrfv(Seq(black, black, white).map(Codec.writePpm(w, h, _))),
      Map("n_frames" -> "3"))).toDS()
    val ds = frameDeltas(planted).collect().sortBy(_.frameIdx)
    assert(ds.length == 2)
    assert(ds(0) == FrameDelta(7L, 0, 0L, 0L))
    assert(ds(1) == FrameDelta(7L, 1, 192L * 255L, 255L))
  }

  test("frameDeltas matches a naive per-byte recompute on the real corpus") {
    val ca = codecAssets(spark, dir)
    val got = frameDeltas(ca).collect()
      .map(d => (d.assetId, d.frameIdx) -> (d.sad, d.maxd)).toMap
    val vids = ca.filter(_.modality == "video").collect()
    var checked = 0
    vids.foreach { a =>
      val nf = Codec.grfvFrameCount(a.bytes)
      val rasters = (0 until nf).map(fi =>
        Codec.parsePpm(Codec.readGrfvFrame(a.bytes, fi))._3)
      (0 until nf - 1).foreach { fi =>
        val ds = rasters(fi).zip(rasters(fi + 1))
          .map { case (x, y) => math.abs((x & 0xff) - (y & 0xff)).toLong }
        assert(got((a.assetId, fi)) == ((ds.sum, ds.max)),
          s"delta mismatch at asset ${a.assetId} pair $fi")
        checked += 1
      }
    }
    assert(checked > 0 && got.size == checked)
  }

  test("mm10 shots partition each video's frame axis at exactly the cut points") {
    val cuts = graft.operators.MultimodalQueries
      .queries("mm6_scene_cuts")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(4)))
    val shots = graft.operators.MultimodalQueries
      .queries("mm10_scene_keyframes")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(shots.nonEmpty)
    val byAsset = shots.groupBy(_._1)
    val cutsByAsset = cuts.groupBy(_._1)
    byAsset.foreach { case (a, ss) =>
      val ordered = ss.sortBy(_._2)
      // contiguous shot ids from 0; first shot starts at frame 0
      assert(ordered.map(_._2).toSeq == (0L until ordered.length).toSeq)
      assert(ordered.head._3 == 0L)
      // shots tile the axis: each start = previous start + previous length
      ordered.sliding(2).foreach {
        case Array(p, n) => assert(n._3 == p._3 + p._4, s"gap in asset $a")
        case _ =>
      }
      // starts after 0 are exactly the cut pairs' f+1
      val expectedStarts = cutsByAsset(a).filter(_._3).map(_._2 + 1L).toSet
      assert(ordered.drop(1).map(_._3).toSet == expectedStarts, s"asset $a starts")
      // lengths telescope to the asset's frame count (max pair idx + 2)
      val nFrames = cutsByAsset(a).map(_._2).max + 2L
      assert(ordered.map(_._4).sum == nFrames, s"asset $a mass")
      assert(ordered.forall(_._4 > 0L))
    }
  }
}
