package graft.multimodal

import graft.SparkSpec
import graft.multimodal.MultimodalPipeline._

class MultimodalPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val assets = syntheticAssets(spark, dir)

  test("asset schema: binary payload + typed metadata") {
    val schema = assets.schema
    assert(schema("bytes").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "map")
    assert(assets.count() == 500)
  }

  test("decode emits one frame per image/audio asset, sampled frames per video") {
    val frames = decode(assets, stride = 2).cache()
    val perAsset = frames.groupByKey(_.assetId).count().collect().toMap
    val metas = assets.collect().map(a => a.assetId -> a).toMap
    metas.values.foreach { a =>
      val expected = if (a.modality == "video")
        frameIndices(a.meta, 2).size.toLong else 1L
      assert(perAsset(a.assetId) == expected,
        s"asset ${a.assetId} (${a.modality}): ${perAsset(a.assetId)} != $expected")
    }
    assert(frames.filter(_.features.length == 16).count() == frames.count())
  }

  test("decode is deterministic (stubbed codec)") {
    val a = decode(assets).collect().sortBy(f => (f.assetId, f.frameIdx))
    val b = decode(assets).collect().sortBy(f => (f.assetId, f.frameIdx))
    assert(a.map(_.features.toSeq).toSeq == b.map(_.features.toSeq).toSeq)
  }

  test("resize rescales dimensions and features without re-decoding") {
    val frames = decode(assets.limit(10))
    val resized = resize(frames, 32, 32).collect()
    assert(resized.forall(f => f.width == 32 && f.height == 32))
  }
}
