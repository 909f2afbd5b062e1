package graft.operators

import java.nio.file.Files

import graft.SparkSpec

/** dd19 canonical-copy selection: a planted near-dup pair where the
  * quality argmax and dd6's lowest-id rule DISAGREE (the policy the
  * operator exists for), plus cross-query recomposition on the driver
  * corpus. */
class CanonicalCopySpec extends SparkSpec {
  import spark.implicits._

  private lazy val planted: String = {
    val d = Files.createTempDirectory("dd19").toString
    val base = "the " + (1 to 79).map(i => s"word$i").mkString(" ")
    val docs = Seq(
      // doc 1: the EARLIER, DIRTY copy — boilerplate punctuation tail
      // drops its (1 − punct_ratio) quality factor below doc 2's
      (1L, base + " !!! ??? ;;; %%%"),
      // doc 2: the later, clean copy — near-identical shingle set
      (2L, base),
      // doc 3: unrelated singleton
      (3L, "the " + (1 to 30).map(i => s"only$i").mkString(" ")))
      .toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("planted pair: the cleaner LATER copy wins over the lowest id") {
    // fixture sanity: the pair must actually cluster (band-collide +
    // verify) — otherwise this spec tests nothing
    val labels = DedupQueries.queries("dd6_dup_clusters")(spark, planted)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels(1L) == 1L && labels(2L) == 1L,
      s"planted near-dups must share a cluster: $labels")
    assert(labels(3L) == 3L)

    val rows = DedupQueries.queries("dd19_canonical_copy")(spark, planted)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getBoolean(4)))).toMap
    val (_, q1, sz1, keep1) = rows(1L)
    val (_, q2, _, keep2) = rows(2L)
    assert(sz1 == 2L)
    assert(q2 > q1, "the clean copy must out-score the dirty one")
    assert(!keep1 && keep2,
      "dd19 must keep the higher-quality copy where dd6 would keep the lower id")
    assert(rows(3L)._4, "singletons keep themselves")
  }

  test("driver corpus: keep flags recompose from declared dd6 + tx2 outputs") {
    val dir = "/root/testdata/sf0.001"
    val labels = DedupQueries.queries("dd6_dup_clusters")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val quality = TextQueries.queries("tx2_quality_score")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(r.fieldIndex("quality"))).toMap
    val rows = DedupQueries.queries("dd19_canonical_copy")(spark, dir).collect()
    assert(rows.length == labels.size)
    val byCluster = rows.groupBy(_.getLong(1))
    byCluster.foreach { case (cid, rs) =>
      assert(rs.count(_.getBoolean(4)) == 1, s"cluster $cid must keep exactly one")
      val want = rs.map(_.getLong(0)).minBy(id => (-quality(id), id))
      val got = rs.find(_.getBoolean(4)).get.getLong(0)
      assert(got == want, s"cluster $cid canonical $got != argmax $want")
    }
    rows.foreach(r => assert(labels(r.getLong(0)) == r.getLong(1)))
  }
}
