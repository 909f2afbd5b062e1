package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.build.{DerivedCache, DocTables}
import graft.operators.Ingest
import graft.sources.Tables

/** Streaming-vs-batch parity for the document-index ingest: folding
  * micro-batches through [[StreamingDocumentIngest]] must leave EVERY
  * maintained at-rest document table — including the order-dependent
  * packing offsets — identical to the batch `appendDocumentBatch` path
  * folding the same deltas in the same order. Composes with the
  * incremental specs (batch append vs full rebuild) to close
  * streamed == rebuilt. Also pins the replay-ledger no-op. */
class StreamingDocumentIngestSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private val docs = Tables.documents(spark, "/root/testdata/sf0.001")

  // monotone-id split: base below, two delta "days" above (the normal
  // ingest stream shape; the interior-backfill branch is covered by
  // OffsetsMaintenanceSpec on the batch path this wrapper delegates to)
  private lazy val ids = docs.select($"doc_id").orderBy($"doc_id")
    .collect().map(_.getLong(0))
  private lazy val cut1 = ids(ids.length / 2)
  private lazy val cut2 = ids(ids.length * 3 / 4)
  private lazy val base = docs.filter($"doc_id" <= cut1)
  private lazy val delta1 = docs.filter($"doc_id" > cut1 && $"doc_id" <= cut2)
  private lazy val delta2 = docs.filter($"doc_id" > cut2)

  private def asTuples(df: DataFrame) = df
    .select($"doc_id", $"text", $"lang", $"source", $"n_chars")
    .collect().toSeq
    .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))

  test("streamed micro-batches == batch appendDocumentBatch, table for table") {
    implicit val sqlCtx = spark.sqlContext
    val dBatch = s"/stream-doc-batch/${java.util.UUID.randomUUID()}"
    val dStream = s"/stream-doc-stream/${java.util.UUID.randomUUID()}"
    assert(delta1.count() > 0 && delta2.count() > 0)

    Ingest.buildDocumentIndexes(spark, dBatch, base)
    // provision the saturation-escalation pair index on BOTH corpora so the
    // stream's appends maintain it and the table loop compares it
    graft.operators.DedupQueries.docPairs(spark, dBatch)
    Ingest.appendDocumentBatch(spark, dBatch, delta1)
    Ingest.appendDocumentBatch(spark, dBatch, delta2)

    Ingest.buildDocumentIndexes(spark, dStream, base)
    graft.operators.DedupQueries.docPairs(spark, dStream)
    val in = MemoryStream[(Long, String, String, String, Long)]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-stream-doc").toString
    val q = StreamingDocumentIngest.start(
      in.toDF().toDF("doc_id", "text", "lang", "source", "n_chars"),
      dStream, ckpt)
    try {
      def feed(delta: DataFrame): Unit = {
        in.addData(asTuples(delta))
        q.processAllAvailable()
      }
      feed(delta1)
      feed(delta2)
    } finally q.stop()

    for (t <- Ingest.maintainedDocTables) {
      assert(DerivedCache.isBuilt(spark, dStream, t) == DerivedCache.isBuilt(spark, dBatch, t),
        s"${t._1}: built-ness must agree between streamed and batch corpora")
      if (DerivedCache.isBuilt(spark, dBatch, t))
        assert(rows(DerivedCache.existing(spark, dStream, t))
            == rows(DerivedCache.existing(spark, dBatch, t)),
          s"streamed ${t._1} must equal the batch-appended table")
    }

    // dd10's VERDICT table under live arrival: the online-containment query
    // over the stream-maintained indexes must equal the batch path — under
    // the normal route AND under forced pair-witness escalation (the
    // round-13 saturation scale path), closing the last online-dedup gap
    def dd10(d: String): Seq[String] =
      rows(graft.operators.DedupQueries.queries("dd10_online_containment")(spark, d))
    assert(dd10(dStream) == dd10(dBatch),
      "streamed dd10 verdicts must equal the batch path")
    val fanoutKey = "spark.graft.containment.escalateFanout"
    spark.conf.set(fanoutKey, "0.0")
    try assert(dd10(dStream) == dd10(dBatch),
      "streamed dd10 verdicts must equal the batch path under pair escalation")
    finally spark.conf.unset(fanoutKey)
  }

  test("CDC stream (adds + deletes) == the batch append/delete sequence") {
    implicit val sqlCtx = spark.sqlContext
    val dBatch = s"/stream-cdc-batch/${java.util.UUID.randomUUID()}"
    val dStream = s"/stream-cdc-stream/${java.util.UUID.randomUUID()}"
    // deletions span an old (base) doc and a just-streamed (delta1) doc
    val delIds = Set(ids.head, ids(ids.length / 2 + 1))
    val dels = docs.filter($"doc_id".isInCollection(delIds))
    assert(dels.count() == 2)

    Ingest.buildDocumentIndexes(spark, dBatch, base)
    Ingest.appendDocumentBatch(spark, dBatch, delta1)
    Ingest.appendDocumentBatch(spark, dBatch, delta2)
    Ingest.deleteDocumentBatch(spark, dBatch, dels)

    Ingest.buildDocumentIndexes(spark, dStream, base)
    val in = MemoryStream[(Long, String, String, String, Long, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-stream-cdc").toString
    val q = StreamingDocumentIngest.startCdc(
      in.toDF().toDF("doc_id", "text", "lang", "source", "n_chars", "op"),
      dStream, ckpt)
    try {
      def feed(delta: DataFrame, op: String): Unit = {
        in.addData(asTuples(delta).map(t => (t._1, t._2, t._3, t._4, t._5, op)))
        q.processAllAvailable()
      }
      feed(delta1, "add")
      feed(delta2, "add")
      feed(dels, "delete")
    } finally q.stop()

    for (t <- Ingest.maintainedDocTables
         if DerivedCache.isBuilt(spark, dBatch, t)) {
      assert(rows(DerivedCache.existing(spark, dStream, t))
          == rows(DerivedCache.existing(spark, dBatch, t)),
        s"CDC-streamed ${t._1} must equal the batch sequence")
    }
  }

  test("a CDC batch adding and deleting the same doc_id is rejected") {
    val d = s"/stream-cdc-bad/${java.util.UUID.randomUUID()}"
    Ingest.buildDocumentIndexes(spark, d, base)
    val bad = asTuples(delta1).take(1).flatMap(t =>
      Seq((t._1, t._2, t._3, t._4, t._5, "add"),
        (t._1, t._2, t._3, t._4, t._5, "delete")))
      .toDF("doc_id", "text", "lang", "source", "n_chars", "op")
    val ckpt = s"/stream-cdc-bad-ckpt/${java.util.UUID.randomUUID()}"
    val e = intercept[IllegalArgumentException] {
      StreamingDocumentIngest.foldCdcBatch(spark, d, ckpt)(bad, 0L)
    }
    assert(e.getMessage.contains("must not add AND delete"))
  }

  test("a replayed batch id is skipped — no double-append") {
    val d = s"/stream-doc-replay/${java.util.UUID.randomUUID()}"
    Ingest.buildDocumentIndexes(spark, d, base)
    val ckpt = s"/stream-doc-replay-ckpt/${java.util.UUID.randomUUID()}"
    StreamingDocumentIngest.foldBatch(spark, d, ckpt)(delta1.toDF(), 0L)
    val n = DerivedCache.existing(spark, d, DocTables.Postings).count()
    val meta = rows(DerivedCache.existing(spark, d,
      graft.operators.PipelineQueries.OffsetsMetaTable))
    StreamingDocumentIngest.foldBatch(spark, d, ckpt)(delta1.toDF(), 0L)
    assert(DerivedCache.existing(spark, d, DocTables.Postings).count() == n,
      "replayed batch must not append again")
    assert(rows(DerivedCache.existing(spark, d,
      graft.operators.PipelineQueries.OffsetsMetaTable)) == meta,
      "replayed batch must not advance the offsets meta")
    StreamingDocumentIngest.foldBatch(spark, d, ckpt)(delta2.toDF(), 1L)
    assert(DerivedCache.existing(spark, d, DocTables.Postings).count() > n,
      "the next real batch must still fold")
  }
}
