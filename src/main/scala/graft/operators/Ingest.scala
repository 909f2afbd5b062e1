package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.build.{DerivedCache, DocTables}

/** The document-ingest entry points — ONE list of the at-rest document
  * index tables, so the bench, the specs, and a library user can't drift
  * on which tables a batch ingest maintains.
  *
  *  - [[buildDocumentIndexes]]: day-0 (or periodic-rebuild) materialization
  *    of every per-document index plus the pair graph and cluster table,
  *    over an explicit documents frame under an explicit corpus key.
  *  - [[appendDocumentBatch]]: the daily path — per-document index appends
  *    (`DedupQueries.appendDocuments`, `TextQueries.appendDocuments`)
  *    followed by the incremental pair-graph/cluster fold
  *    (`DedupQueries.appendDupClusters`).
  */
object Ingest {

  /** Build every at-rest document index over `docs` under corpus key `d`.
    * Idempotent per table ([[DerivedCache.table]] markers). */
  def buildDocumentIndexes(s: SparkSession, d: String, docs: DataFrame): Unit = {
    import s.implicits._
    val sh = DerivedCache.table(s, d, DocTables.Shingles)(
      DedupQueries.shingleRowsOf(docs))
    val mh = DerivedCache.table(s, d, DocTables.Minhash)(
      DedupQueries.minhashRowsOf(sh))
    val bd = DerivedCache.table(s, d, DocTables.Bands)(
      DedupQueries.bandRowsOf(mh))
    val fp = DerivedCache.table(s, d, DocTables.Fingerprints)(
      DedupQueries.fpRowsOf(docs))
    val sizes = DerivedCache.table(s, d, DocTables.Sizes)(
      DedupQueries.sizeRowsOf(sh))
    DerivedCache.table(s, d, DocTables.Postings)(
      TextQueries.postingRowsOf(docs))
    val pairs = DerivedCache.table(s, d, DocTables.DupPairs)(
      DedupQueries.dupPairRowsOf(sh, bd, fp, Some(sizes)))
    DerivedCache.table(s, d, DocTables.DupClusters)(
      DedupQueries.clusterRowsOf(docs.select($"doc_id"), pairs)
        .withColumnRenamed("label", "cluster_id"))
    // the containment-prefix family last (it reads the shingle + size
    // tables): building it HERE pins its df snapshot to ingest time, so an
    // appended corpus can never see a timing-dependent prefix state
    DedupQueries.buildPrefixIndex(s, d)
    ()
  }

  /** Fold a NEW document batch into every at-rest index — the daily ingest.
    * Caller contract: batch doc_ids must not already be indexed. */
  def appendDocumentBatch(s: SparkSession, d: String, batch: DataFrame): Unit = {
    DedupQueries.appendDocuments(s, d, batch)
    TextQueries.appendDocuments(s, d, batch)
    DedupQueries.appendDupClusters(s, d, batch)
  }
}
