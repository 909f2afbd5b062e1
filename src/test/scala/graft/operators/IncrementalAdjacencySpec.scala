package graft.operators

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.build.{DerivedCache, DocTables, GraphCache}

/** Incremental adjacency maintenance: folding a frame-interaction delta
  * into the at-rest temporal adjacency index (keyed full-outer merge +
  * CSR rewrite, [[ReachabilityQueries.appendInteractions]]) must equal a
  * full rebuild over base ∪ delta — the engine-side analog of the
  * reference's incremental timeline insert. */
class IncrementalAdjacencySpec extends SparkSpec {
  import spark.implicits._

  private val d = s"/incremental-adj/${java.util.UUID.randomUUID()}"

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("appendInteractions == full rebuild of the temporal adjacency index") {
    val fi = GraphCache(spark, "/root/testdata/sf0.001").frameInteractions
      .select($"frame_id", $"actor1", $"actor2")
    val base = fi.filter($"frame_id" % 2 === 0)
    val delta = fi.filter($"frame_id" % 2 =!= 0)
    assert(base.count() > 0 && delta.count() > 0, "split must be non-trivial")
    // the split must exercise the MERGE path: some (src, dst) pair active
    // in both halves, so its frame sets have to union
    val overlap = ReachabilityQueries.adjacencyRowsOf(base).select($"src", $"dst")
      .intersect(ReachabilityQueries.adjacencyRowsOf(delta).select($"src", $"dst"))
      .count()
    assert(overlap > 0, "split must leave at least one pair present in both halves")

    DerivedCache.table(spark, d, DocTables.TemporalAdj)(
      ReachabilityQueries.adjacencyRowsOf(base))
    ReachabilityQueries.appendInteractions(spark, d, delta)

    assert(rows(DerivedCache.existing(spark, d, DocTables.TemporalAdj))
        == rows(ReachabilityQueries.adjacencyRowsOf(fi)),
      "merged adjacency index must equal the full rebuild")
  }
}
