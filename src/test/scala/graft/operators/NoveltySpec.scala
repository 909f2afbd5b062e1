package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** dd16 novelty profile: planted first-occurrence semantics + conservation
  * on the real corpus (every distinct shingle is novel exactly once). */
class NoveltySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("dd16 planted corpus charges repeats to every doc after the first") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("dd16-planted").toString
    // doc 0: both shingles first-seen -> novelty 1.0
    // doc 1: identical text -> both shingles repeat -> 0.0
    // doc 2: one shared ("b c d"), one fresh ("c d e") -> 0.5
    // doc 3: under 3 tokens -> no shingles -> absent from the profile
    Seq(
      (0L, "a b c d"), (1L, "a b c d"), (2L, "b c d e"), (3L, "x y"))
      .toDF("doc_id", "text")
      .select($"doc_id", $"text", lit("en").as("lang"), lit("s").as("source"),
        length($"text").cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = DedupQueries.queries("dd16_novelty_profile")(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got.keySet == Set(0L, 1L, 2L))
    assert(got(0L) == ((2L, 2L, 1.0)))
    assert(got(1L) == ((2L, 0L, 0.0)))
    assert(got(2L) == ((2L, 1L, 0.5)))
  }

  test("dd16 conservation on the real corpus: each distinct shingle novel once") {
    val rows = DedupQueries.queries("dd16_novelty_profile")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, novel, frac) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(novel >= 0L && novel <= n)
      assert(frac == novel.toDouble / n.toDouble)
    }
    // the first document by id sees everything for the first time
    assert(rows.minBy(_.getLong(0)).getDouble(3) == 1.0)
    // sum of novel counts == the corpus's distinct shingle count
    val docs = graft.sources.Tables.documents(spark, dir)
    val distinctShingles = DedupQueries.shingleRowsOf(docs)
      .select(col("sg")).distinct().count()
    assert(rows.map(_.getLong(2)).sum == distinctShingles)
  }
}
