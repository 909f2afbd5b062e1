package graft.operators

import java.nio.file.Files

import graft.SparkSpec

/** tx19 bigram-LM familiarity on a planted corpus: repeated transitions
  * score familiar, gibberish scores foreign, and the zero-bigram edge
  * reports zeros instead of nulls. */
class LmFamiliaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("lmfam").toString
    val docs = Seq(
      (1L, "the cat sat"), // every transition seen 3× corpus-wide
      (2L, "the cat sat"),
      (3L, "the cat sat"),
      (4L, "zq xv qp"),    // transitions unique to this doc
      (5L, "hello"))       // no bigram at all
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("fluent, gibberish, and empty docs get the hand-computed profiles") {
    val rows = TextQueries.queries("tx19_lm_familiarity")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap
    assert(rows.size == 5)
    // (doc_id, n_bigrams, n_oov, oov_frac, mean_bfreq, familiar)
    assert(rows(1L) == Seq(1L, 2L, 0L, 0.0, 3.0, true))
    assert(rows(2L) == Seq(2L, 2L, 0L, 0.0, 3.0, true))
    assert(rows(4L) == Seq(4L, 2L, 2L, 1.0, 1.0, false))
    assert(rows(5L) == Seq(5L, 0L, 0L, 0.0, 0.0, true))
  }
}
