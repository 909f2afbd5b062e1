package graft.operators

import java.nio.file.Files

import graft.SparkSpec

/** p11 token-budget selection: a hand-checkable planted corpus pins the
  * greedy semantics; the driver corpus pins the bucketed two-level rank
  * against a collected sorted recompute (the a14 differential discipline)
  * and the prefix property every budget selection must have. */
class BudgetSelectSpec extends SparkSpec {
  import spark.implicits._

  private lazy val planted: String = {
    val d = Files.createTempDirectory("p11-planted").toString
    // quality levels by the tx2 formula: "the ..." 12-token no-punct docs
    // score 1.0 (stop ratio 1/12 > 0.02), the stopword-free one 0.5, the
    // 5-token one 0.0. total = 12+12+12+5 = 41 tokens, budget = half.
    val w12 = (1 to 11).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, s"the $w12".replaceFirst(" w11", " end")), // 12 tok, q=1.0
      (2L, s"the $w12"),                              // 12 tok, q=1.0
      (3L, (1 to 12).map(i => s"x$i").mkString(" ")), // 12 tok, q=0.5
      (4L, "p q r s t"))                              // 5 tok, q=0.0
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("planted corpus selects exactly the ranking prefix under half mass") {
    val rows = PipelineQueries.queries("p11_budget_select")(spark, planted)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(rows.size == 4)
    // ranking (quality DESC, doc_id): 1 (cum 0), 2 (12), 3 (24), 4 (36);
    // total 41 → selected iff 2·cum_before < 41, so docs 1 and 2 only —
    // doc 2 crosses the half line and is still taken (first-crossing rule)
    assert(rows(1L) == ((1.0, 12L, 0L, true)))
    assert(rows(2L) == ((1.0, 12L, 12L, true)))
    assert(rows(3L) == ((0.5, 12L, 24L, false)))
    assert(rows(4L) == ((0.0, 5L, 36L, false)))
  }

  test("driver corpus: bucketed rank equals the sorted recompute, prefix-shaped") {
    val rows = PipelineQueries.queries("p11_budget_select")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    val total = rows.map(_._3).sum
    // independent greedy recompute off the same (quality, n_tokens) rows
    var cum = 0L
    val ranked = rows.sortBy(r => (-r._2, r._1))
    ranked.foreach { case (id, _, nTok, cumBefore, selected) =>
      assert(cumBefore == cum, s"doc $id cum_before $cumBefore != recompute $cum")
      assert(selected == (2 * cum < total), s"doc $id verdict mismatch")
      cum += nTok
    }
    // prefix property + the half-mass bite: some selected, some not
    val flags = ranked.map(_._5)
    val nSel = flags.count(identity)
    assert(nSel > 0 && nSel < rows.length, "the relative budget must bite")
    assert(flags.take(nSel).forall(identity) && flags.drop(nSel).forall(!_),
      "selection must be a prefix of the ranking")
  }
}
