package graft.operators

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.build.DerivedCache
import graft.sources.Tables

/** Incremental maintenance for the at-rest packing offsets (p05/p06's
  * `doc_offsets` + running-total meta): offsets are the one per-document
  * index that is ORDER-dependent, so beyond the append == rebuild parity
  * every maintained family proves, the monotone-id contract is ENFORCED,
  * not assumed. */
class OffsetsMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private val src = "/root/testdata/sf0.001"

  private def freshKey(): String =
    s"/offsets-spec/${java.util.UUID.randomUUID()}"

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("two daily appends == one full rebuild, offsets and meta bit-for-bit") {
    val docs = Tables.documents(spark, src)
    val ids = docs.select($"doc_id").orderBy($"doc_id").collect().map(_.getLong(0))
    val (cut1, cut2) = (ids(ids.length / 3), ids(2 * ids.length / 3))

    val inc = freshKey()
    PipelineQueries.buildOffsets(spark, inc, docs.filter($"doc_id" <= cut1))
    PipelineQueries.appendOffsets(spark, inc,
      docs.filter($"doc_id" > cut1 && $"doc_id" <= cut2))
    PipelineQueries.appendOffsets(spark, inc, docs.filter($"doc_id" > cut2))

    val full = freshKey()
    PipelineQueries.buildOffsets(spark, full, docs)

    def read(d: String, t: (String, Int)) = DerivedCache.existing(spark, d, t)
    assert(rows(read(inc, PipelineQueries.OffsetsTable)) ==
      rows(read(full, PipelineQueries.OffsetsTable)),
      "appended offsets must equal the full rebuild")
    assert(rows(read(inc, PipelineQueries.OffsetsMetaTable)) ==
      rows(read(full, PipelineQueries.OffsetsMetaTable)),
      "appended running-total meta must equal the full rebuild")
  }

  test("an INTERIOR batch (backfill) re-prefixes to the exact rebuild") {
    // every doc after the insertion point shifts, so the interior path
    // recomputes — from narrow at-rest rows, not the corpus text — and
    // must still equal a from-scratch build over the full corpus
    val docs = Tables.documents(spark, src)
    val ids = docs.select($"doc_id").orderBy($"doc_id").collect().map(_.getLong(0))
    val (cut1, cut2) = (ids(ids.length / 3), ids(2 * ids.length / 3))

    val inc = freshKey()
    // base skips the MIDDLE third; the backfill lands strictly inside
    PipelineQueries.buildOffsets(spark, inc,
      docs.filter($"doc_id" <= cut1 || $"doc_id" > cut2))
    PipelineQueries.appendOffsets(spark, inc,
      docs.filter($"doc_id" > cut1 && $"doc_id" <= cut2))

    val full = freshKey()
    PipelineQueries.buildOffsets(spark, full, docs)
    def read(d: String, t: (String, Int)) = DerivedCache.existing(spark, d, t)
    assert(rows(read(inc, PipelineQueries.OffsetsTable)) ==
      rows(read(full, PipelineQueries.OffsetsTable)),
      "backfilled offsets must equal the full rebuild")
    assert(rows(read(inc, PipelineQueries.OffsetsMetaTable)) ==
      rows(read(full, PipelineQueries.OffsetsMetaTable)),
      "backfilled meta must equal the full rebuild")
  }

  test("an empty batch is a no-op") {
    val docs = Tables.documents(spark, src)
    val d = freshKey()
    PipelineQueries.buildOffsets(spark, d, docs)
    val before = rows(DerivedCache.existing(spark, d, PipelineQueries.OffsetsTable))
    PipelineQueries.appendOffsets(spark, d, docs.filter($"doc_id" < 0))
    assert(rows(DerivedCache.existing(spark, d, PipelineQueries.OffsetsTable)) == before)
  }
}
