package graft.operators

import java.nio.file.Files

import graft.SparkSpec

/** tx20 lexical diversity on a planted corpus: the degenerate
  * single-word doc scores 0, the all-distinct doc scores the
  * hand-computed Gini–Simpson rational, and token-empty docs report
  * zeros. The hash oracle pins the corpus; this pins the formula. */
class LexicalDiversitySpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("tx20").toString
    Seq(
      (1L, "a a a a"),       // one type: diversity 0
      (2L, "a b c d"),       // all distinct: (16-4)/16 = 0.75
      (3L, "a a b b"),       // two even types: (16-8)/16 = 0.5
      (4L, ""))              // token-empty: zeros
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("hand-computed TTR and Gini–Simpson rationals") {
    val rows = TextQueries.queries("tx20_lexical_diversity")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(rows.size == 4)
    assert(rows(1L) == ((4L, 1L, 0.25, 0.0)))
    assert(rows(2L) == ((4L, 4L, 1.0, 0.75)))
    assert(rows(3L) == ((4L, 2L, 0.5, 0.5)))
    assert(rows(4L) == ((0L, 0L, 0.0, 0.0)))
  }
}
