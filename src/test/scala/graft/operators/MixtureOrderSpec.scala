package graft.operators

import graft.SparkSpec

/** p12 mixture order: the stream is a permutation, within-language ranks
  * are dense, and — the property the operator exists for — EVERY prefix
  * of the stream carries the corpus's language mix to within the grid
  * deviation bound. */
class MixtureOrderSpec extends SparkSpec {

  test("stream is a mixture-preserving permutation") {
    val rows = PipelineQueries.queries("p12_mixture_order")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val n = rows.length
    assert(n > 0)
    // positions are a 0..N−1 permutation
    assert(rows.map(_._4).sorted.toSeq == (0L until n).toSeq)
    // within-language ranks are dense 1..n_l
    rows.groupBy(_._2).foreach { case (lang, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (1L to rs.length).toSeq,
        s"ranks not dense for $lang")
    }
    // the interleave property: for every prefix, each language's count is
    // within ±2 of its proportional share (grid quantization + rounding)
    val byPos = rows.sortBy(_._4)
    val share = rows.groupBy(_._2).map { case (l, rs) => l -> rs.length.toDouble / n }
    val seen = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    byPos.zipWithIndex.foreach { case ((_, lang, _, _), i) =>
      seen(lang) += 1
      val p = i + 1
      share.foreach { case (l, sh) =>
        val dev = math.abs(seen(l) - p * sh)
        assert(dev <= 2.0 + 1e-9,
          s"prefix $p: language $l count ${seen(l)} deviates $dev from ${p * sh}")
      }
    }
  }
}
