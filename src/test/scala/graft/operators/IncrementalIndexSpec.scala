package graft.operators

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.build.{DerivedCache, DocTables}
import graft.sources.Tables

/** Incremental index maintenance: appending the per-document derivations of
  * a document delta to the at-rest shingle / minhash / band tables must
  * equal a full rebuild over base ∪ delta — the property that lets a 100-TB
  * pipeline ingest a daily append without re-shingling the corpus. */
class IncrementalIndexSpec extends SparkSpec {
  import spark.implicits._

  // unique fake corpus key per run: the at-rest tables live under
  // target/graft-cache/<key>/ and a reused key would double-append
  private val d = s"/incremental-spec-corpus/${java.util.UUID.randomUUID()}"

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("appendDocuments == full rebuild for shingle/minhash/band indexes") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text")
    val base = docs.filter($"doc_id" % 3 =!= 0)
    val delta = docs.filter($"doc_id" % 3 === 0)
    assert(base.count() > 0 && delta.count() > 0, "split must be non-trivial")

    // ingest day 0: build the at-rest indexes over the BASE corpus only
    val sh0 = DerivedCache.table(spark, d, DocTables.Shingles)(
      DedupQueries.shingleRowsOf(base))
    val mh0 = DerivedCache.table(spark, d, DocTables.Minhash)(
      DedupQueries.minhashRowsOf(sh0))
    DerivedCache.table(spark, d, DocTables.Bands)(
      DedupQueries.bandRowsOf(mh0))
    DerivedCache.table(spark, d, DocTables.Fingerprints)(
      DedupQueries.fpRowsOf(base))
    DerivedCache.table(spark, d, DocTables.Sizes)(
      DedupQueries.sizeRowsOf(sh0))
    DerivedCache.table(spark, d, DocTables.Windows)(
      DedupQueries.windowRowsOf(base))

    // ingest day 1: the delta appends — derivation over delta docs ONLY
    DedupQueries.appendDocuments(spark, d, delta)

    // read back through the cache with a poisoned build closure: the tables
    // must be served from the appended files, never rebuilt
    def readBack(name: String): DataFrame =
      DerivedCache.table(spark, d, name, 1)(
        sys.error(s"$name must come from the at-rest files, not a rebuild"))

    val fullSh = DedupQueries.shingleRowsOf(docs)
    val fullMh = DedupQueries.minhashRowsOf(fullSh)
    assert(rows(readBack("doc_shingles")) == rows(fullSh),
      "appended shingle index must equal the full rebuild")
    assert(rows(readBack("doc_minhash")) == rows(fullMh),
      "appended minhash index must equal the full rebuild")
    assert(rows(readBack("doc_mh_bands")) == rows(DedupQueries.bandRowsOf(fullMh)),
      "appended band index must equal the full rebuild")
    assert(rows(readBack("doc_fp")) == rows(DedupQueries.fpRowsOf(docs)),
      "appended fingerprint index must equal the full rebuild")
    assert(rows(readBack("doc_sizes")) == rows(DedupQueries.sizeRowsOf(fullSh)),
      "appended size table must equal the full rebuild")
    assert(rows(readBack("doc_windows")) == rows(DedupQueries.windowRowsOf(docs)),
      "appended positional window index must equal the full rebuild")
  }

  test("TextQueries.appendDocuments == full rebuild for the posting index") {
    val dd = s"/incremental-postings/${java.util.UUID.randomUUID()}"
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text")
    val base = docs.filter($"doc_id" % 3 =!= 0)
    val delta = docs.filter($"doc_id" % 3 === 0)

    DerivedCache.table(spark, dd, DocTables.Postings)(
      TextQueries.postingRowsOf(base))
    DerivedCache.table(spark, dd, DocTables.Cms)(
      TextQueries.cmsRowsOf(base))
    TextQueries.appendDocuments(spark, dd, delta)

    assert(rows(DerivedCache.existing(spark, dd, DocTables.Postings))
        == rows(TextQueries.postingRowsOf(docs)),
      "appended posting index must equal the full rebuild")
    // the CMS table holds batch PARTIALS: equality to a rebuild is the
    // mergeable-sketch property, and holds only after the read-side fold
    val folded = DerivedCache.existing(spark, dd, DocTables.Cms)
      .groupBy("r", "c").agg(org.apache.spark.sql.functions.sum("cnt").as("cnt"))
    assert(rows(folded) == rows(TextQueries.cmsRowsOf(docs)),
      "folded appended CMS cells must equal the single-pass rebuild")
    // and the partials really are partials (two builds present at rest)
    assert(DerivedCache.existing(spark, dd, DocTables.Cms).count()
        > TextQueries.cmsRowsOf(docs).count() ||
      rows(DerivedCache.existing(spark, dd, DocTables.Cms)) != rows(folded),
      "append must file-append partials, not rewrite the folded table")
  }

  test("append refuses a table whose base was never built") {
    val e = intercept[IllegalArgumentException] {
      DerivedCache.append(spark, s"$d-unbuilt", DocTables.Shingles)(
        Seq((1L, "a b c")).toDF("doc_id", "sg"))
    }
    assert(e.getMessage.contains("not built"))
  }
}
