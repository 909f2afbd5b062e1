package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ss17 MMR re-ranking: planted-geometry semantics (diversity beats
  * redundant relevance) + greedy-trajectory invariants on the real corpus.
  * The hash oracle pins the full trajectory; these pin WHY it is right. */
class MmrSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("ss17 trajectory invariants on the real corpus") {
    val rows = SimilarityQueries.queries("ss17_mmr_rerank")(spark, dir).collect()
    assert(rows.length == SimilarityQueries.MmrK)
    // contiguous ranks, distinct picks
    assert(rows.map(_.getInt(0)).toSeq == (1 to rows.length))
    assert(rows.map(_.getLong(1)).distinct.length == rows.length)
    rows.foreach { r =>
      val (rel, maxSim, mmr) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      // the score identity is exact — same doubles, same two ops
      assert(mmr == 0.5 * rel - 0.5 * maxSim)
      assert(maxSim >= -1.0 && maxSim <= 1.0 + 1e-12)
    }
    // round 1 is the pure-relevance pick: empty selected set, max rel
    assert(rows.head.getDouble(3) == 0.0)
    assert(rows.head.getDouble(2) == rows.map(_.getDouble(2)).max)
    // from round 2 on the greedy score sequence is non-increasing: a later
    // pick's score at its own round is <= its score at any earlier round
    // >= 2 (the real max_sim only grows as the selected set grows), which
    // is <= that round's argmax. Round 1 is excluded: its max_sim is 0.0
    // by definition, but a round-2 candidate's true max_sim can be
    // NEGATIVE (anti-correlated pool), legitimately scoring above it.
    val mmrs = rows.map(_.getDouble(4)).toSeq.drop(1)
    assert(mmrs == mmrs.sorted.reverse, s"mmr not non-increasing from rank 2: $mmrs")
  }

  test("ss17 diversity: second pick jumps clusters where pure relevance repeats") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("ss17-planted").toString
    // probe (id 0) at e1; cluster A = {1,2,3} at +26 degrees (rel ~0.90,
    // mutually ~identical); cluster B = {4,5} at -32 degrees on the OTHER
    // side (rel ~0.85, sim to A ~0.53). Pure relevance ranks A,A first;
    // MMR's round-2 A score is 0.5*(0.90 - ~1.0) < 0 while B scores
    // 0.5*(0.85 - 0.53) > 0 — the second pick must switch clusters.
    def pad(v: Seq[Float]) = v ++ Seq.fill(8 - v.size)(0.0f)
    val vecs = Seq(
      0L -> Seq(1.0f, 0.0f, 0.0f),
      1L -> Seq(0.9f, 0.436f, 0.0f),
      2L -> Seq(0.9f, 0.4361f, 0.0f),
      3L -> Seq(0.9f, 0.4359f, 0.0f),
      4L -> Seq(0.85f, -0.5268f, 0.0f),
      5L -> Seq(0.85f, -0.5269f, 0.0f))
    vecs.map { case (id, v) => (id, pad(v), 0) }
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val rows = SimilarityQueries.queries("ss17_mmr_rerank")(spark, tmp).collect()
    assert(rows.length == 5, "pool smaller than MmrK yields every candidate")
    val order = rows.map(_.getLong(1)).toSeq
    assert(Set(1L, 2L, 3L).contains(order.head), s"rank 1 should be a cluster-A top: $order")
    assert(Set(4L, 5L).contains(order(1)), s"rank 2 should switch to cluster B: $order")

    // full naive driver recompute of the greedy trajectory (double cosines;
    // margins here are far above the decimal-vs-double ulp difference)
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      dot / (na * nb)
    }
    val byId = vecs.toMap
    val probe = byId(0L)
    val pool = vecs.filter(_._1 != 0L).map { case (id, v) => id -> cos(v, probe) }
    var picked = Vector.empty[Long]
    (1 to 5).foreach { _ =>
      val best = pool.filterNot(c => picked.contains(c._1)).map { case (id, rl) =>
        val ms = if (picked.isEmpty) 0.0 else picked.map(p => cos(byId(id), byId(p))).max
        (id, 0.5 * rl - 0.5 * ms)
      }.minBy { case (id, mmr) => (-mmr, id) }
      picked :+= best._1
    }
    assert(order == picked, s"greedy trajectory mismatch: got $order expected $picked")
  }
}
