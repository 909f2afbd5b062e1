package graft.tools

import graft.SparkSpec

/** Pins the ANN recall FLOORS as quality targets, so a recall regression
  * fails the build, not just the round artifact diff (`RECALL_r{N}.json`).
  *
  * Round-8 calibration: the flat landscape (the corpus as-is, best
  * non-self cosine ≈ 0.4) is the hardest operating point — every floor
  * below sits one notch under the value measured at sf0.01 after the
  * Hamming-pool rework (ss2 1.0, ss9 0.98, ss7 0.9, ss4 1.0, ss5 0.9,
  * ss6 1.0, ss8 1.0), and at or above the round-7 verdict's quality
  * targets (ss2 ≥ 0.8, ss9 ≥ 0.6, ss7 ≥ 0.8). The planted-near-dup
  * regime (cosine ≈ 0.97, the operating point the BANDING family is
  * tuned for) keeps its 0.9 candidate-recall floor. */
class RecallAuditSpec extends SparkSpec {

  private lazy val r = RecallAudit.recalls(spark, "/root/testdata/sf0.01")

  test("rerank-pool and IVF ANN stay near-exact on the flat landscape") {
    assert(r("ss4_ivf_topk") >= 0.9, s"ss4 recall@10 = ${r("ss4_ivf_topk")}")
    assert(r("ss5_ivf_kmeans") >= 0.8, s"ss5 recall@10 = ${r("ss5_ivf_kmeans")}")
    assert(r("ss6_sq_rerank") >= 0.9, s"ss6 recall@10 = ${r("ss6_sq_rerank")}")
    assert(r("ss8_mips") >= 0.9, s"ss8 recall@10 = ${r("ss8_mips")}")
    // round-10 floor raise: the TRAINED 16×32 PQ codebook measures 1.0 at
    // both sfs (RECALL_r10) — ≥ 0.95 is the quality target, not the pin
    assert(r("ss7_pq_topk") >= 0.95, s"ss7 recall@10 = ${r("ss7_pq_topk")}")
    // fusion exists to recover what either family loses — it must do at
    // least as well as the better single floor
    assert(r("ss10_rank_fusion") >= 0.9, s"ss10 recall@10 = ${r("ss10_rank_fusion")}")
    // range search admits to mean + 3.5 sd at the radius (per-vector miss
    // ≈ 2e-4 one-sided), so set recall must sit essentially at 1
    assert(r("ss11_range_search") >= 0.95, s"ss11 range recall = ${r("ss11_range_search")}")
    // the batch range join shares ss11's admission bound, measured at
    // pair level over the whole batch
    assert(r("ss15_range_join") >= 0.95, s"ss15 range recall = ${r("ss15_range_join")}")
    // the IVF-PQ composition is bounded below by min(ss4, ss7)'s floors;
    // round-10 measured 1.0/1.0 with the trained codebook
    assert(r("ss12_ivfpq_topk") >= 0.95, s"ss12 recall@10 = ${r("ss12_ivfpq_topk")}")
  }

  test("Hamming-pool ANN clears its quality floors on the flat landscape") {
    assert(r("ss2_lsh_topk") >= 0.9, s"ss2 recall@10 = ${r("ss2_lsh_topk")}")
    assert(r("ss9_knn_join") >= 0.8, s"ss9 pair-level recall = ${r("ss9_knn_join")}")
    // pre-filter semantics: recall vs the FILTERED exact top-k must match
    // ss2's unfiltered floor — a post-filter regression craters this
    assert(r("ss13_filtered_topk") >= 0.9,
      s"ss13 filtered recall@10 = ${r("ss13_filtered_topk")}")
  }

  test("IVF recall is monotone in nProbe and exhaustive at nProbe == cells") {
    val ladder = RecallAudit.ivfNprobeLadder(spark, "/root/testdata/sf0.01")
    def monotone(rs: Seq[Double]) =
      rs.zip(rs.tail).forall { case (a, b) => b >= a - 1e-9 }
    assert(monotone(ladder.map(_._2)), s"ss4 recall not monotone in nProbe: $ladder")
    assert(monotone(ladder.map(_._3)), s"ss5 recall not monotone in nProbe: $ladder")
    // at nProbe == cells every cell is probed — the scan is exhaustive
    // exact cosine, so recall must be exactly 1 for both quantizers
    assert(ladder.last._1 == 16 && ladder.last._2 == 1.0 && ladder.last._3 == 1.0,
      s"exhaustive probe not exact: $ladder")
  }

  test("banding recall at the designed near-dup operating point clears 0.9") {
    val (recall, cos) = RecallAudit.plantedBandRecall(spark, "/root/testdata/sf0.01")
    assert(cos > 0.95 && cos < 0.99, s"planted cosine drifted: $cos")
    assert(recall >= 0.9, s"planted band recall = $recall (predicted ≈ 0.95)")
  }
}
