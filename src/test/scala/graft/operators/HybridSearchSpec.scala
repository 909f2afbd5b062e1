package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ss14's fusion contract: the hash oracle pins the exact result; these pin
  * the structural claims — candidates come only from the two input
  * rankings, scores stay in RRF range, and both retrieval modes actually
  * contribute to the fused top-k. */
class HybridSearchSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("ss14 fuses only ids ranked by the lexical or vector side") {
    import spark.implicits._
    val fused = SimilarityQueries.queries("ss14_hybrid_search")(spark, dir).collect()
    assert(fused.nonEmpty)
    val vec = SimilarityQueries.queries("ss2_lsh_topk")(spark, dir)
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    // reconstruct the lexical candidate set independently: docs sharing at
    // least one term with the probe document (doc 0 = min vec_id)
    val post = TextQueries.postings(spark, dir).select($"doc_id", $"t")
    val pterms = post.filter($"doc_id" === 0L).select($"t").distinct()
    val lexCand = post.join(pterms, "t").filter($"doc_id" =!= 0L)
      .select($"doc_id").distinct().collect().map(_.getLong(0)).toSet
    fused.foreach { r =>
      val id = r.getLong(0)
      assert(vec.contains(id) || lexCand.contains(id),
        s"fused id $id is in neither input ranking's candidate set")
      val rrf = r.getDouble(1)
      assert(rrf > 0.0 && rrf <= 2.0 / 61.0 + 1e-15, s"rrf $rrf out of range")
      assert(id != 0L, "probe doc must be excluded")
    }
    // a doc ranked first on BOTH sides would score 2/61; ids present on
    // both sides must outrank any id of equal single-side rank — spot-check
    // that the fused list is sorted by score then id
    val scores = fused.map(r => (-r.getDouble(1), r.getLong(0))).toSeq
    assert(scores == scores.sorted, "fusion output must be rank-ordered")
  }

  test("both retrieval modes contribute to the fused list") {
    import spark.implicits._
    val fused = SimilarityQueries.queries("ss14_hybrid_search")(spark, dir)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val vecTop = SimilarityQueries.queries("ss2_lsh_topk")(spark, dir)
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    // the lexical ranking is independent of the embedding space — the
    // fusion must not collapse to the vector input alone
    assert(fused != vecTop, "fusion must not equal the vector ranking alone")
    assert(fused.intersect(vecTop).nonEmpty,
      "high vector ranks must survive fusion")
  }
}
