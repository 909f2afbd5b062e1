package graft.operators

import graft.SparkSpec

/** ss19b (the at-scale sampled Pareto audit): structural invariants of the
  * curve — the probe count is the fixed sample size, recall is monotone
  * non-decreasing in pool width (a superset pool's exact rerank can only
  * displace a true hit with another true hit), and hits are bounded by
  * n_probes·K. */
class Ss19bSpec extends SparkSpec {

  test("sampled Pareto curve: fixed probe count, monotone recall, bounded hits") {
    val rows = SimilarityQueries.queries("ss19b_pareto_sampled")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 4, "one row per declared pool width")
    val pools = rows.map(_.getInt(0))
    assert(pools.sorted.sameElements(pools), "rows ordered by pool")
    assert(rows.map(_.getLong(1)).distinct.toSeq == Seq(8L), "fixed probe sample")
    val recalls = rows.map(_.getDouble(3))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => b >= a },
      s"recall must be monotone in pool width: ${recalls.mkString(", ")}")
    rows.foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(2) <= r.getLong(1) * 20,
        s"hits bounded by n_probes * TopK: $r")
    }
  }
}
