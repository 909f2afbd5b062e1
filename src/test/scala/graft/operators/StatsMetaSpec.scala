package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.build.DerivedCache
import graft.sources.Tables

/** The round-14 stats meta tables (`sh_stats`, `sim_stats`): route
  * selection for the escalation families reads at-rest CONSTANTS instead
  * of aggregating the corpus indexes at query time, so the values must be
  * (a) equal to the live aggregations they replace and (b) kept equal by
  * every mutation path (append, delete) — a stale constant would pick the
  * wrong route or, worse, let a saturated corpus through the mass gate. */
class StatsMetaSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    .select($"doc_id", $"text")
  private val base = docs.filter($"doc_id" % 3 =!= 0)
  private val delta = docs.filter($"doc_id" % 3 === 0)

  private def freshKey(tag: String): String =
    s"/stats-meta-$tag/${java.util.UUID.randomUUID()}"

  /** The live whole-corpus single-witness aggregation statsRowsOf mirrors,
    * written independently from the declared semantics. */
  private def liveContainStats(d: String): (Long, Long) = {
    val sh = DerivedCache.existing(spark, d, graft.build.DocTables.Shingles)
    val live = sh.groupBy($"sg").agg(count(lit(1)).as("dfm"))
    val core = DerivedCache.existing(spark, d, DedupQueries.PrefixTable)
      .filter($"core")
    val m1 = core.select($"sg")
      .join(live, Seq("sg"), "left")
      .agg(coalesce(sum($"dfm" - 1L), lit(0L))).head.getLong(0)
    (m1, core.count())
  }

  /** The live SimHash single-band occupancy aggregation, recomputed from
    * the raw text (not the sh_sim index) so index staleness would show. */
  private def liveSimStats(corpus: org.apache.spark.sql.DataFrame): (Long, Long) = {
    val hashed = DedupQueries.simHashRowsOf(corpus)
    val occ = DedupQueries.simhashSingleBands(hashed)
      .groupBy($"band", $"chunk").agg(count(lit(1)).as("occ"))
    val m = occ.agg(coalesce(sum(expr("occ * (occ - 1) div 2")), lit(0L)))
      .head.getLong(0)
    (m, 4L * corpus.count())
  }

  private def metaRow(d: String, t: (String, Int)): (Long, Long) = {
    val r = DerivedCache.existing(spark, d, t).head
    (r.getLong(0), r.getLong(1))
  }

  test("stats meta rows equal the live aggregations after build, append, delete") {
    val d = freshKey("ladder")
    Ingest.buildDocumentIndexes(spark, d, base)
    assert(DerivedCache.isBuilt(spark, d, DedupQueries.PrefixStatsTable))
    assert(DerivedCache.isBuilt(spark, d, DedupQueries.SimStatsTable))
    assert(metaRow(d, DedupQueries.PrefixStatsTable) == liveContainStats(d))
    assert(metaRow(d, DedupQueries.SimStatsTable) == liveSimStats(base))

    Ingest.appendDocumentBatch(spark, d, delta)
    assert(metaRow(d, DedupQueries.PrefixStatsTable) == liveContainStats(d),
      "containment stats must refresh inside the append")
    assert(metaRow(d, DedupQueries.SimStatsTable) == liveSimStats(docs),
      "SimHash stats must refresh inside the append")

    Ingest.deleteDocumentBatch(spark, d, delta)
    assert(metaRow(d, DedupQueries.PrefixStatsTable) == liveContainStats(d),
      "containment stats must refresh inside the delete")
    assert(metaRow(d, DedupQueries.SimStatsTable) == liveSimStats(base),
      "SimHash stats must refresh inside the delete")
  }

  test("sh_sim maintenance is append/delete-exact vs per-document recompute") {
    val d = freshKey("sim")
    Ingest.buildDocumentIndexes(spark, d, base)
    Ingest.appendDocumentBatch(spark, d, delta)
    val got = DerivedCache.existing(spark, d, DedupQueries.SimTable)
      .collect().map(_.toString).sorted.toSeq
    val want = DedupQueries.simHashRowsOf(docs)
      .collect().map(_.toString).sorted.toSeq
    assert(got == want)
    Ingest.deleteDocumentBatch(spark, d, delta)
    val afterDelete = DerivedCache.existing(spark, d, DedupQueries.SimTable)
      .collect().map(_.toString).sorted.toSeq
    val wantBase = DedupQueries.simHashRowsOf(base)
      .collect().map(_.toString).sorted.toSeq
    assert(afterDelete == wantBase)
  }

  test("whole-corpus preflight constants match the predicate-path live probe") {
    val d = freshKey("routes")
    Ingest.buildDocumentIndexes(spark, d, docs)
    // dd7 run via the live-aggregation path (wholeCorpus = false) and via
    // the constant path must produce identical results — the route choice
    // derives from the same two scalars either way
    val live = DedupQueries.containmentPairs(spark, d,
      "dd7_prefix_containment", lit(true), lit(true))
      .collect().map(_.toString).sorted.toSeq
    val const = DedupQueries.containmentPairs(spark, d,
      "dd7_prefix_containment", lit(true), lit(true), wholeCorpus = true)
      .collect().map(_.toString).sorted.toSeq
    assert(live == const)
  }
}
