package graft.operators

import graft.SparkSpec

/** dd20 threshold sweep: planted pair stats — counts are monotone
  * non-increasing in τ, the boundary comparison is inclusive AND exact
  * (a pair at Jaccard exactly 1/2 qualifies at τ = 1/2, where a
  * float-threshold compare could tie-break either way), zero-match
  * thresholds still report rows, and identical sets survive to τ = 1. */
class ThresholdSweepSpec extends SparkSpec {

  private def run(pairs: Seq[(Long, Long, Long, Long, Long)]) = {
    import spark.implicits._
    DedupQueries.sweepOf(pairs.toDF("d1", "d2", "shared", "n1", "n2"))
      .collect()
      .map(r => (r.getInt(1), r.getInt(2)) ->
        ((r.getDouble(0), r.getLong(3), r.getLong(4))))
      .toMap
  }

  test("planted pairs: inclusive exact boundary, monotone counts, full grid") {
    val out = run(Seq(
      (1L, 2L, 10L, 10L, 10L), // jac = 1     -> every threshold
      (3L, 4L, 5L, 10L, 10L),  // jac = 1/3   -> none
      (5L, 6L, 8L, 10L, 10L),  // jac = 8/12  -> tau <= 2/3: 1/2 and 3/5
      (7L, 8L, 6L, 9L, 9L)))   // jac = 1/2   -> EXACTLY tau = 1/2 (inclusive)
    assert(out.size == DedupQueries.SweepTaus.size)
    assert(out((1, 2)) == ((0.5, 3L, 6L)))
    assert(out((3, 5)) == ((0.6, 2L, 4L)))
    assert(out((7, 10)) == ((0.7, 1L, 2L)))
    assert(out((4, 5)) == ((0.8, 1L, 2L)))
    assert(out((9, 10)) == ((0.9, 1L, 2L)))
    assert(out((1, 1)) == ((1.0, 1L, 2L)))
    // monotone non-increasing in tau
    val byTau = out.values.toSeq.sortBy(_._1)
    assert(byTau.zip(byTau.tail).forall { case ((_, p1, d1), (_, p2, d2)) =>
      p2 <= p1 && d2 <= d1 })
  }

  test("empty candidate set still reports every threshold with zeros") {
    val out = run(Seq.empty)
    assert(out.size == DedupQueries.SweepTaus.size)
    assert(out.values.forall { case (_, p, d) => p == 0L && d == 0L })
  }

  test("declared query agrees with the dd3 verified pairs at each tau") {
    val dir = "/root/testdata/sf0.001"
    val sweep = DedupQueries.queries("dd20_threshold_sweep")(spark, dir)
      .collect().map(r => r.getDouble(0) -> r.getLong(3)).toMap
    // dd3 reports candidate pairs with jac >= Tau (0.8); its pair count at
    // the sweep's 4/5 row must agree (same candidates, same verify)
    val dd3n = DedupQueries.queries("dd3_minhash_lsh")(spark, dir).count()
    assert(sweep(0.8) == dd3n, s"sweep@0.8 ${sweep(0.8)} != dd3 $dd3n")
  }
}
