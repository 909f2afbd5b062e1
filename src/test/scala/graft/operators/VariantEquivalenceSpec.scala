package graft.operators

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** The reference's differential-pair testing (SURVEY.md §5): hand-written
  * plan alternates of the same semantic query must produce identical rows.
  * The driver's oracle asserts this transitively (each variant against the
  * same SQL); these tests assert it directly, engine-side, so a variant
  * regression is caught before any oracle run. */
class VariantEquivalenceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def rows(name: String): Set[Seq[Any]] =
    ParityQueries.queries(name)(spark, dir).collect().map(_.toSeq).toSet

  test("c05 == c05b (aggregate-then-join vs join-then-aggregate)") {
    assert(rows("c05_active_actors") == rows("c05b_active_actors_alt"))
  }

  test("c06 == c06b (partition column vs frames join)") {
    assert(rows("c06_actor_days") == rows("c06b_actor_days_denorm"))
  }

  test("c09 == c09b (INTERSECT vs 4-hop equi-join)") {
    assert(rows("c09_common_neighbors") == rows("c09b_common_neighbors_4hop"))
  }

  test("c11a == c11b == c11c (pruned scan vs anchored semi-join vs denorm join)") {
    val a = rows("c11a_ego_triangles")
    assert(a == rows("c11b_ego_triangles_anchored"))
    assert(a == rows("c11c_ego_triangles_denorm"))
    assert(a.nonEmpty)
  }

  test("q18 pivot == the explicit conditional-aggregation formulation") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.functions.Exact.dsum
    val pivoted = RelationalQueries.queries("q18_pivot")(spark, dir)
      .collect().map(_.toSeq).toSet
    def rev(st: String) =
      coalesce(dsum(when($"o_orderstatus" === st, $"o_totalprice")), lit(0.0))
    def n(st: String) = count(when($"o_orderstatus" === st, lit(1)))
    val manual = graft.sources.Tables.orders(spark, dir)
      .groupBy(year($"o_orderdate").cast("long").as("o_year"))
      .agg(rev("F").as("rev_f"), n("F").as("n_f"),
        rev("O").as("rev_o"), n("O").as("n_o"),
        rev("P").as("rev_p"), n("P").as("n_p"))
      .collect().map(_.toSeq).toSet
    assert(pivoted == manual)
    assert(pivoted.nonEmpty)
  }

  test("dd3's LSH-candidate pairs are a subset of dd2's exhaustive pairs") {
    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exhaustive = pairs(DedupQueries.queries("dd2_ngram_jaccard")(spark, dir))
    val lsh = pairs(DedupQueries.queries("dd3_minhash_lsh")(spark, dir))
    assert(lsh.subsetOf(exhaustive),
      s"LSH found pairs the exhaustive join missed: ${lsh.diff(exhaustive)}")
  }

  test("dd8 estimate: a band collision forces >= BandWidth/K agreement; tracks exact") {
    val rows = DedupQueries.queries("dd8_minhash_estimate")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getDouble(2); val exact = r.getDouble(3)
      // candidates collide on a whole band = 3 of the 12 positions agree —
      // a deterministic floor, not a statistical one
      assert(est >= 3.0 / 12 - 1e-9, s"est $est below the band floor")
      assert(est >= 0 && est <= 1 && exact > 0 && exact <= 1)
    }
    val mae = rows.map(r => math.abs(r.getDouble(2) - r.getDouble(3))).sum / rows.length
    assert(mae <= 0.25, s"K=12 sketch MAE implausibly high: $mae")
  }

  test("ss4 IVF top-k recall vs the ss1 exact baseline is >= 0.8") {
    // nProbe=4 of 16 cells must still find most of the true top-20. (No
    // analogous bound for ss2: hyperplane-LSH banding guarantees recall only
    // in the high-cosine regime, and this corpus plants no near-dups — max
    // pairwise cosine ≈ 0.51 — so ss2's candidates are by design the bucket
    // tail, oracle-checked for exactness rather than recall.)
    def ids(name: String): Set[Long] =
      SimilarityQueries.queries(name)(spark, dir).collect().map(_.getLong(0)).toSet
    val exact = ids("ss1_cosine_topk")
    val ivf = ids("ss4_ivf_topk")
    val recall = ivf.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"ss4 recall too low: $recall")
    // trained quantizer (ss5): on THIS corpus (isotropic synthetic vectors,
    // no cluster structure) k-means mainly balances cell sizes, so recall
    // sits near ss4's — the win appears on clustered real corpora. Floor set
    // below the observed 0.8 at both sfs.
    val km = ids("ss5_ivf_kmeans")
    val kmRecall = km.intersect(exact).size.toDouble / exact.size
    assert(kmRecall >= 0.7, s"ss5 recall too low: $kmRecall")
    // int8 scalar quantization + exact rerank (ss6): the approx ranking
    // only has to land the true top-20 inside its top-50 rerank pool, so
    // recall should be near-perfect even at 8-bit precision
    val sq = ids("ss6_sq_rerank")
    val sqRecall = sq.intersect(exact).size.toDouble / exact.size
    assert(sqRecall >= 0.9, s"ss6 recall too low: $sqRecall")
    // product quantization (ss7): M=4 16-dim subspaces over a 16-entry
    // fixed codebook is aggressive compression on isotropic vectors, but
    // the ADC ranking only has to land the true top-20 inside its top-50
    // rerank pool; floor set below the observed recall at both sfs
    val pq = ids("ss7_pq_topk")
    val pqRecall = pq.intersect(exact).size.toDouble / exact.size
    assert(pqRecall >= 0.5, s"ss7 recall too low: $pqRecall")
  }

  test("ss8 MIPS recall vs a brute-force exact-dot ranking is >= 0.9") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.functions.VectorOps.dotExact
    val emb = graft.sources.Tables.embeddings(spark, dir)
    val probe = emb.orderBy($"vec_id").limit(1)
      .select($"vec_id".as("pid"), $"embedding".as("pemb"))
    val exact = emb.crossJoin(broadcast(probe)).filter($"vec_id" =!= $"pid")
      .select($"vec_id", dotExact($"embedding", $"pemb").as("dot"))
      .orderBy(desc("dot"), $"vec_id").limit(20)
      .collect().map(_.getLong(0)).toSet
    val mips = SimilarityQueries.queries("ss8_mips")(spark, dir)
      .collect().map(_.getLong(0)).toSet
    val recall = mips.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"ss8 recall too low: $recall")
  }

  test("ss3 candidates respect the threshold and canonical pair order") {
    val rows = SimilarityQueries.queries("ss3_embed_neardup")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.35)
    }
  }
}
