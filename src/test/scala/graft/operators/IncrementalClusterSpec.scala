package graft.operators

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.build.{DerivedCache, DocTables}
import graft.sources.Tables

/** Incremental CLUSTER maintenance: appending a document batch and running
  * [[DedupQueries.appendDupClusters]] (batch-only verified pairs → graph
  * contraction onto existing labels → min-label over the contracted graph →
  * one linear remap pass) must equal a full dd6-style rebuild over
  * base ∪ delta — the property that lets a 100-TB pipeline keep the
  * dup-cluster table current without ever re-running a corpus-sized
  * fixpoint. */
class IncrementalClusterSpec extends SparkSpec {
  import spark.implicits._

  // unique fake corpus key per test: the at-rest tables live under
  // target/graft-cache/<key>/ and a reused key would double-append
  private def freshDir(tag: String) =
    s"/incremental-cluster-$tag/${java.util.UUID.randomUUID()}"

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  /** Ingest day 0: every at-rest document index over the BASE corpus only
    * — the same single table list the bench and a library user go through. */
  private def buildBase(d: String, base: DataFrame): Unit =
    Ingest.buildDocumentIndexes(spark, d, base)

  /** The ground truth: one whole-corpus pair derivation + labeling. */
  private def fullRebuild(docs: DataFrame): DataFrame = {
    val sh = DedupQueries.shingleRowsOf(docs)
    val bd = DedupQueries.bandRowsOf(DedupQueries.minhashRowsOf(sh))
    val fp = DedupQueries.fpRowsOf(docs)
    DedupQueries.clusterRowsOf(docs.select($"doc_id"),
        DedupQueries.dupPairRowsOf(sh, bd, fp))
      .withColumnRenamed("label", "cluster_id")
  }

  test("appendDupClusters == full rebuild on an sf0.001 corpus split") {
    val d = freshDir("corpus")
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text")
    val base = docs.filter($"doc_id" % 3 =!= 0)
    val delta = docs.filter($"doc_id" % 3 === 0)
    assert(base.count() > 0 && delta.count() > 0, "split must be non-trivial")

    buildBase(d, base)
    Ingest.appendDocumentBatch(spark, d, delta)

    assert(rows(DerivedCache.existing(spark, d, DocTables.DupClusters))
        == rows(fullRebuild(docs)),
      "incrementally maintained cluster table must equal the full rebuild")
  }

  test("a batch doc bridging two existing clusters merges them (remap path)") {
    val d = freshDir("merge")
    // handcrafted shingle geometry: t1/t2 share only the 8 pure-c shingles
    // (Jaccard 8/12 < 0.8 → two distinct base clusters, each held together
    // by its exact-duplicate pair), while the bare c-run is 8/10 = 0.8 to
    // BOTH — so the batch doc is a verified near-dup of both clusters and
    // must merge them through the contracted loop's remap
    val run = (1 to 10).map(i => s"c$i").mkString(" ")
    val base = Seq(
      (1L, s"$run x1 x2"), (2L, s"$run x1 x2"),
      (10L, s"$run y1 y2"), (11L, s"$run y1 y2")).toDF("doc_id", "text")
    val delta = Seq((20L, run)).toDF("doc_id", "text")

    buildBase(d, base)
    val before = DerivedCache.existing(spark, d, DocTables.DupClusters)
      .as[(Long, Long)].collect().toMap
    assert(before == Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L),
      s"base must start as two distinct clusters, got $before")

    Ingest.appendDocumentBatch(spark, d, delta)

    assert(rows(DerivedCache.existing(spark, d, DocTables.DupClusters))
        == rows(fullRebuild(base.unionAll(delta))),
      "merged cluster table must equal the full rebuild")
    val after = DerivedCache.existing(spark, d, DocTables.DupClusters)
      .as[(Long, Long)].collect().toMap
    assert(after == Map(1L -> 1L, 2L -> 1L, 10L -> 1L, 11L -> 1L, 20L -> 1L),
      s"the bridge doc must merge both clusters onto min id 1, got $after")
    // the appended pair graph must stay component-consistent with the
    // cluster table: re-deriving components from at-rest dup_pairs yields
    // the same labels (p04's leak-free split reads the pair graph)
    val fromPairs = DedupQueries.clusterRowsOf(
        base.unionAll(delta).select($"doc_id"),
        DerivedCache.existing(spark, d, DocTables.DupPairs))
      .withColumnRenamed("label", "cluster_id")
    assert(rows(fromPairs) == rows(DerivedCache.existing(spark, d, DocTables.DupClusters)),
      "components of the appended pair graph must equal the cluster table")
  }

  test("two consecutive ingest days equal the full rebuild") {
    val d = freshDir("twodays")
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text")
    val base = docs.filter($"doc_id" % 3 === 1)
    val day1 = docs.filter($"doc_id" % 3 === 2)
    val day2 = docs.filter($"doc_id" % 3 === 0)

    buildBase(d, base)
    Ingest.appendDocumentBatch(spark, d, day1)
    Ingest.appendDocumentBatch(spark, d, day2) // append-after-replace path

    assert(rows(DerivedCache.existing(spark, d, DocTables.DupClusters))
        == rows(fullRebuild(docs)),
      "two maintained ingest days must equal the one-shot full rebuild")
  }

  test("append == full rebuild across randomized corpora and splits") {
    // deterministic pseudo-random corpora over a tiny vocabulary: short
    // texts collide heavily, so exact dups, LSH near-dups, batch-internal
    // pairs, and merges all arise naturally across the seeds
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsi", "zeta", "eta", "theta")
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed)
      val texts = (0 until 24).map { _ =>
        Seq.fill(4 + rnd.nextInt(9))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val corpus = (0 until 24).map { i =>
        // every fourth doc verbatim-copies an earlier one: exact-dup stars
        val t = if (i % 4 == 3) texts(rnd.nextInt(i)) else texts(i)
        (i.toLong, t)
      }
      val df = corpus.toDF("doc_id", "text")
      val batch = df.filter($"doc_id" % 3 === seed % 3)
      val base = df.filter($"doc_id" % 3 =!= seed % 3)

      val d = freshDir(s"prop$seed")
      buildBase(d, base)
      Ingest.appendDocumentBatch(spark, d, batch)
      assert(rows(DerivedCache.existing(spark, d, DocTables.DupClusters))
          == rows(fullRebuild(df)),
        s"seed $seed: maintained clusters must equal the full rebuild")
    }
  }

  test("an empty batch is a no-op") {
    val d = freshDir("empty")
    val base = Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    buildBase(d, base)
    val before = rows(DerivedCache.existing(spark, d, DocTables.DupClusters))
    DedupQueries.appendDupClusters(spark, d,
      base.filter($"doc_id" < 0)) // empty ingest day
    assert(rows(DerivedCache.existing(spark, d, DocTables.DupClusters)) == before)
  }

  test("an isolated batch doc becomes a singleton cluster") {
    val d = freshDir("isolated")
    val base = Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val delta = Seq((2L, "zeta eta theta iota kappa")).toDF("doc_id", "text")
    buildBase(d, base)
    Ingest.appendDocumentBatch(spark, d, delta)
    val after = DerivedCache.existing(spark, d, DocTables.DupClusters)
      .as[(Long, Long)].collect().toMap
    assert(after == Map(1L -> 1L, 2L -> 2L),
      s"unrelated batch doc must form its own singleton, got $after")
  }
}
