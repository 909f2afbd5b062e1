package graft.operators

import graft.SparkSpec

/** dd6 invariants against a driver-side union-find over the SAME pair
  * inputs (dd1 exact groups + dd3 verified near-dup pairs): the relational
  * label propagation must produce exactly the union-find components with
  * min-id canonicals. */
class DedupClusterSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("dd6 clusters equal union-find over dd1 + dd3 pairs") {
    val clusters = DedupQueries.queries("dd6_dup_clusters")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters.nonEmpty)

    // independent recompute: union-find over the declared pair outputs
    val near = DedupQueries.queries("dd3_minhash_lsh")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val exact = DedupQueries.queries("dd1_exact_dedup")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).filter(p => p._1 != p._2)
    val parent = scala.collection.mutable.Map(clusters.keys.map(k => k -> k).toSeq: _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      r
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (near ++ exact).foreach { case (a, b) => union(a, b) }
    // path-compress to canonical min (union always roots at the min id)
    clusters.foreach { case (doc, cid) =>
      assert(cid == find(doc), s"cluster mismatch for $doc: $cid vs ${find(doc)}")
      assert(cid <= doc, s"canonical id must be the component minimum")
    }
    // fixture sanity: the synthetic corpus contains at least one dup pair
    assert(clusters.exists { case (doc, cid) => doc != cid },
      "fixture should contain at least one duplicate")
  }

  test("dd17 histogram recomposes from the declared dd6 labels") {
    val labels = DedupQueries.queries("dd6_dup_clusters")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val hist = DedupQueries.queries("dd17_cluster_profile")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val expected = labels.groupBy(_._2).values.map(_.size.toLong)
      .groupBy(identity).map { case (sz, xs) => sz -> xs.size.toLong }
    assert(hist.view.mapValues(_._1).toMap == expected)
    hist.foreach { case (sz, (k, docs, dups)) =>
      assert(docs == sz * k && dups == (sz - 1) * k)
    }
    // conservation: total docs == corpus, dup mass == dd6's is_dup count
    assert(hist.values.map(_._2).sum == labels.length)
    assert(hist.values.map(_._3).sum ==
      labels.count { case (doc, cid) => doc != cid })
    assert(hist.keys.max >= 2L, "fixture should contain a non-singleton cluster")
  }
}
