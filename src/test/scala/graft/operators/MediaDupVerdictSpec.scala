package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.multimodal.MultimodalPipeline
import graft.multimodal.MultimodalPipeline.MediaAsset
import graft.multimodal.Codec

/** mm18/mm19's per-asset near-dup verdict core
  * ([[MultimodalQueries.dupVerdictRowsOf]]): proven row-for-row against a
  * brute-force reference on planted near-dup corpora, covering the arg-min
  * tie-break (min Hamming, then lowest candidate id), the directed
  * band-collision count, and the collision-free NULL/false shape. The
  * declared queries' formula-reconstruction equivalence is the DuckDB
  * oracle's job; this spec pins the aggregation semantics themselves. */
class MediaDupVerdictSpec extends SparkSpec {
  import spark.implicits._

  private def verdictOf(rows: Seq[(Long, Long, Long, Seq[Int])], maxHam: Long) =
    MultimodalQueries.dupVerdictRowsOf(
      rows.toDF("asset_id", "sig_lo", "sig_hi", "bands"), maxHam)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4))))
      .toMap

  /** Brute-force reference written straight from the declared semantics:
    * directed band collisions, arg-min by (hamming, candidate id). */
  private def brute(rows: Seq[(Long, Long, Long, Seq[Int])], maxHam: Long) =
    rows.map { case (id, lo, hi, bands) =>
      val hits = for {
        (oid, olo, ohi, obands) <- rows if oid != id
        shared = bands.indices.count(j => bands(j) == obands(j))
        if shared > 0
      } yield (oid, java.lang.Long.bitCount(lo ^ olo) + java.lang.Long.bitCount(hi ^ ohi), shared)
      val nHits = hits.map(_._3.toLong).sum
      val best = hits.map { case (oid, ham, _) => (ham.toLong, oid) }.sorted.headOption
      id -> ((nHits, best.map(_._2), best.map(_._1), best.exists(_._1 <= maxHam)))
    }.toMap

  /** Random 8-band byte fingerprints with planted collision structure. */
  private def corpus(seed: Int, n: Int): Seq[(Long, Long, Long, Seq[Int])] = {
    val rng = new scala.util.Random(seed)
    (1 to n).map { i =>
      val bands = Seq.fill(8)(rng.nextInt(256))
      val lo = (0 until 4).map(j => bands(j).toLong << (8 * j)).sum
      val hi = (4 until 8).map(j => bands(j).toLong << (8 * (j - 4))).sum
      (i.toLong, lo, hi, bands)
    }
  }

  test("verdict rows equal the brute-force reference on a random corpus") {
    // 60 assets over 8 byte-bands: birthday collisions guarantee a mix of
    // collision-free, single-hit, and multi-hit neighborhoods
    val rows = corpus(7, 60)
    assert(verdictOf(rows, 12L) == brute(rows, 12L))
  }

  test("arg-min tie-break picks the lowest candidate id at equal hamming") {
    // 2 and 3 are identical, both colliding with 1 on every band at equal
    // hamming; 1 must report best_match = 2
    val sig = Seq(10, 20, 30, 40, 50, 60, 70, 80)
    def packed(b: Seq[Int]) = (
      (0 until 4).map(j => b(j).toLong << (8 * j)).sum,
      (4 until 8).map(j => b(j).toLong << (8 * (j - 4))).sum)
    val (lo, hi) = packed(sig)
    val rows = Seq((1L, lo, hi, sig), (2L, lo, hi, sig), (3L, lo, hi, sig))
    val got = verdictOf(rows, 12L)
    assert(got(1L) == ((16L, Some(2L), Some(0L), true)))
    assert(got(2L) == ((16L, Some(1L), Some(0L), true)))
    assert(got(3L) == ((16L, Some(1L), Some(0L), true)))
    assert(got == brute(rows, 12L))
  }

  test("collision-free assets keep NULL best columns and a false verdict") {
    val rows = Seq(
      (1L, 0L, 0L, Seq(1, 2, 3, 4, 5, 6, 7, 8)),
      (2L, 0L, 0L, Seq(11, 12, 13, 14, 15, 16, 17, 18)))
    val got = verdictOf(rows, 12L)
    assert(got(1L) == ((0L, None, None, false)))
    assert(got(2L) == ((0L, None, None, false)))
  }

  test("planted image near-dups verdict true through the real dHash pipeline") {
    // the ImagePhashSpec planting: single-pixel edits keep most 2x2 block
    // orderings, so banding collides and hamming stays under the threshold
    val rng = new scala.util.Random(11)
    val base = Array.fill(768)((30 + rng.nextInt(170)).toByte)
    val noisy = base.clone()
    Seq(5, 100, 300, 500, 700).foreach(i => noisy(i) = ((noisy(i) & 0xff) + 9).toByte)
    val others = (10L to 29L).map { i =>
      val r = new scala.util.Random(1000 + i.toInt)
      MediaAsset(i, "image", Codec.writePpm(16, 16,
        Array.fill(768)((30 + r.nextInt(170)).toByte)), Map.empty)
    }
    val all = Seq(
      MediaAsset(1, "image", Codec.writePpm(16, 16, base), Map.empty),
      MediaAsset(2, "image", Codec.writePpm(16, 16, noisy), Map.empty)) ++ others
    val hashes = MultimodalPipeline.imageHashes(spark.createDataset(all)).toDF()
      .select(col("assetId").as("asset_id"), col("hLo").as("sig_lo"),
        col("hHi").as("sig_hi"), col("bands"))
    val got = MultimodalQueries.dupVerdictRowsOf(hashes, 12L)
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getBoolean(4)))).toMap
    assert(got(1L) == ((Some(2L), true)))
    assert(got(2L) == ((Some(1L), true)))
    // unrelated assets may collide on a band by chance but never verdict dup
    (10L to 29L).foreach(i => assert(!got(i)._2, s"unrelated $i flagged dup"))
  }
}
