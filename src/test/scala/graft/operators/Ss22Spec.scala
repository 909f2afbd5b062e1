package graft.operators

import graft.SparkSpec

/** ss22 (the sampled nProbe sweep): structural invariants of the curve —
  * fixed probe sample, recall monotone non-decreasing in nProbe (a wider
  * cell fan-out only adds candidates, and the exact re-rank of a superset
  * can only displace a true hit with another true hit), and the widest
  * sweep point is the full scan BY CONSTRUCTION (nProbe = the cell count
  * admits every vector), so the curve tops out at exactly 1.0. */
class Ss22Spec extends SparkSpec {

  test("nProbe sweep: fixed probes, monotone recall, full-scan anchor at 1.0") {
    val rows = SimilarityQueries.queries("ss22_nprobe_sweep")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 5, "one row per sweep value")
    val nps = rows.map(_.getInt(0))
    assert(nps.sorted.sameElements(nps), "rows ordered by nProbe")
    assert(nps.last == SimilarityQueries.DefaultCells,
      "the widest sweep point must be the cell count (the full-scan anchor)")
    assert(rows.map(_.getLong(1)).distinct.toSeq == Seq(8L), "fixed probe sample")
    val recalls = rows.map(_.getDouble(3))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => b >= a },
      s"recall must be monotone in nProbe: ${recalls.mkString(", ")}")
    assert(recalls.last == 1.0,
      s"nProbe = cells is a full scan, recall must be exactly 1.0: ${recalls.last}")
    rows.foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(2) <= r.getLong(1) * 20,
        s"hits bounded by n_probes * TopK: $r")
    }
  }
}
