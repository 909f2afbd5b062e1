package graft.operators

import java.nio.file.Files

import graft.SparkSpec

/** tx16 collocation semantics on a planted corpus: a pair that ALWAYS
  * co-occurs must out-lift high-frequency independent pairs, and the lift
  * value must equal the hand-computed N·c(ab)/(c(a)·c(b)). */
class CollocationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("colloc").toString
    // "san francisco" appears 6 times, always adjacent; "the cat" both
    // frequent but also appearing apart (independent-ish)
    val docs = Seq(
      (1L, "san francisco the cat sat on the mat"),
      (2L, "san francisco the cat ran the mat cat"),
      (3L, "san francisco the mat cat the san francisco"),
      (4L, "the cat san francisco the mat"),
      (5L, "cat the san francisco mat the"),
      (6L, "mat cat the"))
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("planted always-adjacent pair tops the lift ranking, value exact") {
    val rows = TextQueries.queries("tx16_collocations")(spark, dir).collect()
    assert(rows.nonEmpty)
    val top = rows.head
    assert((top.getString(0), top.getString(1)) == ("san", "francisco"))
    // hand-computed: all tokens across the corpus
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .collect().flatMap(_.getString(1).toLowerCase.trim.split("\\s+"))
    val n = toks.length.toDouble
    val cSan = toks.count(_ == "san").toDouble
    val cFr = toks.count(_ == "francisco").toDouble
    val cAb = top.getLong(2).toDouble
    assert(top.getDouble(5) == (n * cAb) / (cSan * cFr), "lift formula")
    // every reported pair clears the inclusion floor
    assert(rows.forall(_.getLong(2) >= 5))
    // ranking is lift-descending
    val lifts = rows.map(_.getDouble(5)).toSeq
    assert(lifts == lifts.sortBy(-_))
  }
}
