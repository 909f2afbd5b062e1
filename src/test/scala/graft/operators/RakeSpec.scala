package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** tx18 RAKE keyphrase extraction: hand-computed planted fixture + corpus
  * invariants. The hash oracle pins the full ranking; these pin the scoring
  * algebra (deg/freq per word, summed per phrase) on a case small enough to
  * verify by hand. */
class RakeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("tx18 planted corpus scores exactly as hand-computed RAKE") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("tx18-planted").toString
    // stop list segments on {the, a, and, of, to, in}:
    //   doc 0 -> [deep learning] x2          (split by "of")
    //   doc 1 -> [spark engine], [deep learning]
    //   doc 2 -> [quantum]
    // word stats over candidate occurrences:
    //   deep/learning: freq 3, deg 3*2=6 -> wscore 2.0
    //   spark/engine:  freq 1, deg 2     -> wscore 2.0
    //   quantum:       freq 1, deg 1     -> wscore 1.0
    // phrase scores: "deep learning" = 4.0 (occ 3), "spark engine" = 4.0
    // (occ 1; tie broken by phrase text), "quantum" = 1.0
    Seq(
      (0L, "deep learning of deep learning"),
      (1L, "the spark engine and deep learning"),
      (2L, "quantum"))
      .toDF("doc_id", "text")
      .select($"doc_id", $"text", lit("en").as("lang"), lit("s").as("source"),
        length($"text").cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = TextQueries.queries("tx18_rake_phrases")(spark, tmp).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == Seq(
      ("deep learning", 2L, 3L, 4.0),
      ("spark engine", 2L, 1L, 4.0),
      ("quantum", 1L, 1L, 1.0)), s"got $got")
  }

  test("tx18 corpus invariants: stopword-free phrases, score >= n_words") {
    val rows = TextQueries.queries("tx18_rake_phrases")(spark, dir).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val (phrase, nWords, nOcc, score) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      val toks = phrase.split(" ").toSeq
      assert(toks.length == nWords, s"'$phrase' token count != n_words")
      assert(toks.forall(t => !TextQueries.stop.contains(t)),
        s"phrase '$phrase' contains a stopword")
      assert(nOcc >= 1L)
      // deg(w) >= freq(w) for every word (each occurrence contributes at
      // least itself), so wscore >= 1 and the phrase score >= its length
      assert(score >= nWords.toDouble - 1e-9, s"'$phrase' score $score < $nWords")
    }
    // the ranking is by (score desc, phrase asc)
    val keys = rows.map(r => (-r.getDouble(3), r.getString(0))).toSeq
    assert(keys == keys.sorted, "output must be ordered by (score desc, phrase)")
  }
}
