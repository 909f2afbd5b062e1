package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.build.{DerivedCache, DocTables, Par}

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
    // Round 15 (guide §2.6 — overlap independent jobs): the table builds
    // below are independent Spark jobs once their inputs exist; phased
    // parallel submission preserves every original happens-before edge
    // (sh → {mh → bd, sizes, prefix}; {bd, fp, sizes} → pairs → clusters;
    // SimTable → sim stats) while letting the rest back-fill the scheduler.
    val sh = DerivedCache.table(s, d, DocTables.Shingles)(
      DedupQueries.shingleRowsOf(docs))
    Par.run(Seq(
      () => {
        val mh = DerivedCache.table(s, d, DocTables.Minhash)(
          DedupQueries.minhashRowsOf(sh))
        DerivedCache.table(s, d, DocTables.Bands)(
          DedupQueries.bandRowsOf(mh))
        ()
      },
      () => { DerivedCache.table(s, d, DocTables.Fingerprints)(
        DedupQueries.fpRowsOf(docs)); () },
      () => { DerivedCache.table(s, d, DocTables.Sizes)(
        DedupQueries.sizeRowsOf(sh)); () },
      () => { DerivedCache.table(s, d, DocTables.Windows)(
        DedupQueries.windowRowsOf(docs)); () },
      () => { DerivedCache.table(s, d, DocTables.Postings)(
        TextQueries.postingRowsOf(docs)); () },
      () => { DerivedCache.table(s, d, DocTables.Cms)(
        TextQueries.cmsRowsOf(docs)); () },
      () => { DerivedCache.table(s, d, DocTables.MediaFp)(
        MultimodalQueries.mediaFpRowsOf(docs)); () },
      // the at-rest SimHash index + its stats meta (dd4's route constants)
      () => { DerivedCache.table(s, d, DedupQueries.SimTable)(
        DedupQueries.simHashRowsOf(docs)); () }))
    val bd = DerivedCache.existing(s, d, DocTables.Bands)
    val fp = DerivedCache.existing(s, d, DocTables.Fingerprints)
    val sizes = DerivedCache.existing(s, d, DocTables.Sizes)
    Par.run(Seq(
      () => {
        val pairs = DerivedCache.table(s, d, DocTables.DupPairs)(
          DedupQueries.dupPairRowsOf(sh, bd, fp, Some(sizes)))
        DerivedCache.table(s, d, DocTables.DupClusters)(
          DedupQueries.clusterRowsOf(docs.select($"doc_id"), pairs)
            .withColumnRenamed("label", "cluster_id"))
        ()
      },
      () => {
        // the containment-prefix family (it reads the shingle + size
        // tables): building it HERE pins its df snapshot to ingest time, so
        // an appended corpus can never see a timing-dependent prefix state —
        // buildPrefixIndex also materializes the containment stats meta
        DedupQueries.buildPrefixIndex(s, d)
        DedupQueries.buildSimStats(s, d)
        // escalation provisioning: on a saturation-profile corpus, build
        // the shingle-pair index at the same snapshot point (no-op
        // otherwise)
        DedupQueries.providePairIndexIfSaturated(s, d)
      },
      () => PipelineQueries.buildOffsets(s, d, docs)))
    ()
  }

  /** Fold a NEW document batch into every at-rest index — the daily ingest.
    * Caller contract: batch doc_ids must not already be indexed. Ends with
    * the compaction sweep ([[compactIfNeeded]]) so file counts are bounded
    * by policy, not by how long the append cadence has been running. */
  def appendDocumentBatch(s: SparkSession, d: String, batch: DataFrame): Unit = {
    // §2.6: the four per-document append families touch disjoint tables and
    // derive only from `batch` — overlap them. The pair-graph/cluster fold
    // stays a second phase: it reads the batch rows back OUT of the band /
    // shingle / fingerprint indexes, so it must observe the completed
    // appends (the original sequential ordering, kept as a barrier).
    Par.run(Seq(
      () => DedupQueries.appendDocuments(s, d, batch),
      () => TextQueries.appendDocuments(s, d, batch),
      () => MultimodalQueries.appendDocuments(s, d, batch),
      () => PipelineQueries.appendOffsets(s, d, batch)))
    DedupQueries.appendDupClusters(s, d, batch)
    compactIfNeeded(s, d)
    ()
  }

  /** Delete a batch of previously-ingested documents from every at-rest
    * document index — the right-to-be-forgotten path every large training
    * pipeline eventually runs (user opt-outs, licensing takedowns),
    * mirroring [[appendDocumentBatch]]. Caller contract: the batch rows
    * are the ORIGINAL ingested rows (doc_id + text) — the text is needed
    * so per-document derivations (the CMS's negated partial cells) never
    * re-read the corpus.
    *
    * Cost model (deletes are BATCHED like appends): each per-document
    * table pays one staged filter-rewrite (the compaction cost class — a
    * parallel columnar scan+filter+write); the linear CMS sketch pays only
    * an appended negative partial; the order-dependent packing offsets
    * re-prefix from their narrow at-rest rows; dup-cluster repair is
    * bounded by the touched clusters (with exact-dup stars re-centered —
    * see [[DedupQueries.deleteDupClusters]]); the df-ranked prefix family
    * keeps its frozen ranks until the shrink trigger, per the
    * frozen-until-drift discipline every trained artifact here follows
    * (prefix ranks, k-means centroids, BPE merges). */
  def deleteDocumentBatch(s: SparkSession, d: String, batch: DataFrame): Unit = {
    val ids = batch.select("doc_id")
    // §2.6 like the append path: disjoint-table filter-rewrites overlap;
    // cluster repair stays a second phase (its scaladoc contract: it must
    // read the post-delete indexes)
    Par.run(Seq(
      () => DedupQueries.deleteDocuments(s, d, ids),
      () => TextQueries.deleteDocuments(s, d, batch),
      () => MultimodalQueries.deleteDocuments(s, d, ids),
      () => PipelineQueries.deleteOffsets(s, d, ids)))
    DedupQueries.deleteDupClusters(s, d, ids)
    compactIfNeeded(s, d)
    ()
  }

  /** ONE list of every at-rest table the document-batch path maintains —
    * the compaction sweep's worklist (replace-maintained tables are listed
    * too: replace rewrites wholesale so they rarely trip the threshold,
    * and listing them keeps the policy exhaustive by construction). */
  private[graft] def maintainedDocTables: Seq[(String, Int)] = Seq(
    DocTables.Shingles, DocTables.Minhash, DocTables.Bands,
    DocTables.Fingerprints, DocTables.Sizes, DocTables.Windows,
    DocTables.Postings, DocTables.Cms, DocTables.MediaFp,
    DocTables.DupPairs, DocTables.DupClusters,
    DedupQueries.PrefixTable, DedupQueries.PrefixDfTable,
    DedupQueries.PrefixMetaTable, DedupQueries.PairTable,
    DedupQueries.SimTable, DedupQueries.SimStatsTable,
    DedupQueries.PrefixStatsTable,
    PipelineQueries.OffsetsTable, PipelineQueries.OffsetsMetaTable)

  /** Data-file ceiling per maintained table before the ingest path compacts
    * it. Each daily append adds one parquet file group per index, so a year
    * of dailies is ~365 small files — scan-task explosion and row-group
    * inefficiency. The default (64 ≈ two months of dailies) bounds both;
    * [[graft.build.DerivedCache.compact]] rewrites to size-targeted files
    * (`spark.graft.compact.targetBytes`, 128 MB), so a compacted 100-TB
    * index still reads at full scan parallelism while a small one collapses
    * to a single row-group-efficient file. */
  val CompactMaxFilesKey = "spark.graft.compact.maxFiles"
  private val CompactMaxFilesDefault = 64

  /** The cadence POLICY: compact every maintained table whose data-file
    * count exceeds the configured ceiling. Content-neutral (compact is a
    * staged replace of the table's own scan). Returns the names compacted
    * — empty when nothing tripped the threshold. */
  def compactIfNeeded(s: SparkSession, d: String): Seq[String] = {
    compactTables(s, d, maintainedDocTables)
  }

  /** The sweep itself, over an explicit worklist — shared with the
    * vector-side append path ([[SimilarityQueries.appendEmbeddings]]), so
    * both ingest families compact under the ONE configured ceiling. */
  private[operators] def compactTables(s: SparkSession, d: String,
      tables: Seq[(String, Int)]): Seq[String] = {
    val max = s.conf.getOption(CompactMaxFilesKey).map(_.toInt)
      .getOrElse(CompactMaxFilesDefault)
    val due = tables.filter(t => DerivedCache.isBuilt(s, d, t) &&
      DerivedCache.parquetFileCount(s, d, t._1, t._2) > max)
    // §2.6: each compaction is an independent staged replace of its own
    // table's scan — overlap the rewrites
    Par.run(due.map(t => () => DerivedCache.compact(s, d, t)))
    due.map(_._1)
  }
}
