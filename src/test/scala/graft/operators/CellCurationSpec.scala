package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ss20 cell-curation map: the planted rollup arithmetic, and the
  * cross-family consistency of the declared query against direct
  * recomputes from the single-family surfaces it composes. */
class CellCurationSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("planted memberships roll up to the exact per-cell profile") {
    import spark.implicits._
    // cell 1: 2 docs, 1 dup, both kept; cell 2: 3 docs, all dups, 1 kept
    val members = Seq(
      (10L, 1L, false, true, 100L),
      (11L, 1L, true, true, 300L),
      (20L, 2L, true, false, 10L),
      (21L, 2L, true, false, 20L),
      (22L, 2L, true, true, 30L)
    ).toDF("vec_id", "cid", "is_dup", "kept", "n_chars")
    val rows = SimilarityQueries.curationProfileOf(members)
      .collect().map(_.toSeq)
    assert(rows.length == 2)
    assert(rows(0) == Seq(1L, 2L, 0.4, 1L, 0.5, 2L, 1.0, 400L, 200.0))
    assert(rows(1) == Seq(2L, 3L, 0.6, 3L, 1.0, 1L, 1.0 / 3, 60L, 20.0))
  }

  test("corpus profile conserves mass and agrees with direct recomputes") {
    import spark.implicits._
    val prof = graft.SparkEntry.queries("ss20_cell_curation")(spark, dir)
    val r = prof.agg(
      sum($"n_docs"), sum($"n_dup_docs"), sum($"n_kept"), sum($"total_chars"),
      sum($"share")).head
    // every vector is a document here, so the cells tile the corpus
    val nVecs = graft.sources.Tables.embeddings(spark, dir).count()
    assert(r.getLong(0) == nVecs)
    assert(math.abs(r.getDouble(4) - 1.0) < 1e-12)

    // dup mass == all members of size-≥2 clusters in the maintained table
    val cl = DedupQueries.dupClusters(spark, dir)
    val nDup = cl.groupBy($"cluster_id").agg(count(lit(1)).as("sz"))
      .filter($"sz" >= 2).agg(sum($"sz")).head.getLong(0)
    assert(r.getLong(1) == nDup)

    // kept mass == the p01 gate verdict count over the vector'd docs
    val nKept = PipelineQueries.gateVerdicts(spark, dir)
      .filter($"kept").count()
    assert(r.getLong(2) == nKept)

    // char mass == the documents table's own column sum
    val nChars = graft.sources.Tables.documents(spark, dir)
      .agg(sum($"n_chars")).head.getLong(0)
    assert(r.getLong(3) == nChars)
  }
}
