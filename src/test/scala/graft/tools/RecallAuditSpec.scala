package graft.tools

import graft.SparkSpec

/** Pins the measured ANN recall floors so a recall regression fails the
  * build, not just the round artifact diff (`RECALL_r{N}.json`).
  *
  * Two regimes, per RecallAudit's doc:
  *  - flat landscape (the corpus as-is, best non-self cosine ≈ 0.5):
  *    rerank-pool methods (ss6/ss8) and IVF (ss4/ss5) stay near-exact;
  *    the LSH-bucketed ones (ss2/ss9) prune to their constructed ≈ 0.15
  *    collision rate — floors pin the measured values, they are NOT
  *    quality targets at this operating point;
  *  - planted near-dups (cosine ≈ 0.97, the operating point the banding
  *    is TUNED for): candidate recall must clear 0.9, the e2e near-dup
  *    recall claim of the ss2/ss3/ss9 family. */
class RecallAuditSpec extends SparkSpec {

  private lazy val r = RecallAudit.recalls(spark, "/root/testdata/sf0.01")

  test("rerank-pool and IVF ANN stay near-exact on the flat landscape") {
    assert(r("ss4_ivf_topk") >= 0.9, s"ss4 recall@10 = ${r("ss4_ivf_topk")}")
    assert(r("ss5_ivf_kmeans") >= 0.8, s"ss5 recall@10 = ${r("ss5_ivf_kmeans")}")
    assert(r("ss6_sq_rerank") >= 0.9, s"ss6 recall@10 = ${r("ss6_sq_rerank")}")
    assert(r("ss8_mips") >= 0.9, s"ss8 recall@10 = ${r("ss8_mips")}")
    // PQ at 4×16 codes on a flat landscape: pool-limited by construction
    assert(r("ss7_pq_topk") >= 0.3, s"ss7 recall@10 = ${r("ss7_pq_topk")}")
  }

  test("LSH-bucketed ANN holds its constructed flat-landscape floor") {
    assert(r("ss2_lsh_topk") >= 0.1, s"ss2 recall@10 = ${r("ss2_lsh_topk")}")
    assert(r("ss9_knn_join") >= 0.05, s"ss9 mean recall = ${r("ss9_knn_join")}")
  }

  test("banding recall at the designed near-dup operating point clears 0.9") {
    val (recall, cos) = RecallAudit.plantedBandRecall(spark, "/root/testdata/sf0.01")
    assert(cos > 0.95 && cos < 0.99, s"planted cosine drifted: $cos")
    assert(recall >= 0.9, s"planted band recall = $recall (predicted ≈ 0.95)")
  }
}
