package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Adversarial shingle-document-frequency fixture. The driver corpus's
  * shingles are mostly unique, so dd2's quadratic shared-shingle join never
  * shows its shape in the measured scaling ladder (SCALING.md §9c used to
  * carry that as a caveat). This corpus is built hostile: boilerplate
  * shingles shared by EVERY document (df = n) plus a Zipf shoulder, inside
  * documents that are otherwise dissimilar (long unique tails, random-pair
  * Jaccard ≈ 0.05), with the true similarity mass planted LINEARLY (one
  * near-dup per 10 documents). Over it:
  *
  *  - dd2's candidate mass (Σ_sg df·(df−1)/2 — exactly its shared-shingle
  *    join size) grows quadratically with corpus size;
  *  - dd3's banded candidates track the PLANTED (linear) mass: a 3-hash
  *    band collides at ≈ J³, so the df-n boilerplate (background J ≈ 0.05)
  *    contributes ~nothing while every planted pair (J ≈ 0.95) collides —
  *    the pigeonhole banding is precisely what absorbs hot df;
  *  - dd7's prefix candidates stay ~linear: hot shingles have MAXIMAL df,
  *    so the df-ranked prefix (rarest ~10%) excludes them by construction
  *    — the PPJoin ordering is exactly an adversarial-df defense.
  *
  * A second test proves the candidate pruning loses nothing here: planted
  * near-dup and containment pairs are still found end-to-end. */
class AdversarialDfSpec extends SparkSpec {
  import spark.implicits._

  /** One universal 5-word boilerplate block (df = n — the extreme Zipf
    * head) in EVERY document, three single-shingle blocks at df = n/2,
    * n/4, n/8 (the Zipf shoulder), and a 40-word unique tail that keeps
    * random-pair Jaccard ≈ 0.05 — hot shingles in otherwise-DISSIMILAR
    * documents, the boilerplate pathology. The linear similarity mass is
    * planted explicitly: every 10th document gets a true near-dup. */
  private def docText(i: Long): String = {
    val boiler = (1 to 5).map(w => s"bw$w").mkString(" ")
    val zipf = Seq(2, 4, 8).filter(k => i % k == 0)
      .map(k => (1 to 3).map(w => s"h${k}w$w").mkString(" ")).mkString(" ")
    val tail = (1 to 40).map(w => s"u${i}t$w").mkString(" ")
    s"$boiler $zipf $tail"
  }

  private def corpus(n: Int): DataFrame =
    ((0L until n.toLong).map(i => (i, docText(i))) ++
      (0L until n.toLong).filter(_ % 10 == 0)
        .map(i => (100000L + i, docText(i) + " extraword")))
      .toDF("doc_id", "text")

  /** (dd2, dd3, dd7) candidate-join sizes over a documents frame, computed
    * from the index derivations without running the joins. */
  private def candidateCounts(docs: DataFrame): (Long, Long, Long) = {
    val sh = DedupQueries.shingleRowsOf(docs).persist()
    try {
      val df = DedupQueries.dfRowsOf(sh).persist()
      try {
        val dd2 = df.agg(sum($"df" * ($"df" - 1L))).head.getLong(0) / 2
        val dd3 = DedupQueries.bandRowsOf(DedupQueries.minhashRowsOf(sh))
          .groupBy($"band", $"bh").agg(count(lit(1)).as("c"))
          .agg(sum($"c" * ($"c" - 1L))).head.getLong(0) / 2
        val dd7 = DedupQueries.prefixRowsOf(sh, df).join(df, "sg")
          .agg(sum($"df")).head.getLong(0)
        (dd2, dd3, dd7)
      } finally df.unpersist()
    } finally sh.unpersist()
  }

  test("Zipfian df: dd2 candidates grow quadratically, dd3/dd7 stay ~linear") {
    val (a2, a3, a7) = candidateCounts(corpus(400))
    val (b2, b3, b7) = candidateCounts(corpus(800))
    info(s"candidate mass 400->800 docs: dd2 $a2->$b2, dd3 $a3->$b3, dd7 $a7->$b7")
    assert(b2.toDouble / a2 > 3.5,
      s"dd2 must be quadratic on hot shingles: $a2 -> $b2 (${b2.toDouble / a2}x)")
    assert(b3.toDouble / a3 < 2.75,
      s"dd3 banding must absorb hot df: $a3 -> $b3 (${b3.toDouble / a3}x)")
    assert(b7.toDouble / a7 < 2.75,
      s"dd7 prefixes must exclude hot shingles: $a7 -> $b7 (${b7.toDouble / a7}x)")
    assert(b3 * 20 < b2 && b7 * 20 < b2,
      s"indexed candidates must be a small fraction of exhaustive: dd2=$b2 dd3=$b3 dd7=$b7")
  }

  test("planted dups survive the hot-shingle corpus end-to-end") {
    val d = s"/adversarial-df/${java.util.UUID.randomUUID()}"
    // near-dup of doc 1: same text + one extra word -> J = 13/14 > 0.8;
    // containment probe: the first 8 words of doc 2 -> C = 1.0
    val planted = Seq(
      (9001L, docText(1) + " extraword"),
      (9002L, docText(2).split(' ').take(8).mkString(" ")))
      .toDF("doc_id", "text")
    Ingest.buildDocumentIndexes(spark, d, corpus(400).unionAll(planted))

    val dd3 = DedupQueries.queries("dd3_minhash_lsh")(spark, d)
      .select($"d1", $"d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dd3.contains((1L, 9001L)),
      s"dd3 must find the planted near-dup under adversarial df, got $dd3")
    // dd2 (gated, input far under the guard here) agrees on the pair
    val dd2 = DedupQueries.queries("dd2_ngram_jaccard")(spark, d)
      .select($"d1", $"d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dd2.contains((1L, 9001L)))
    assert(dd3.subsetOf(dd2), "dd3 must never invent a pair dd2 lacks")

    val dd7 = DedupQueries.containmentPairs(spark, d, "dd7_prefix_containment", lit(true), lit(true))
      .select($"d1", $"d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dd7.contains((9002L, 2L)),
      s"dd7 must find the planted containment under adversarial df, got $dd7")
  }
}
