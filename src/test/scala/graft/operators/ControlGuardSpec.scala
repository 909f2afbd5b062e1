package graft.operators

import graft.SparkSpec

/** The declared control queries (dd2/ss1) are size-gated: above the guard
  * they throw loudly instead of launching quadratic/full-scan work. */
class ControlGuardSpec extends SparkSpec {
  import spark.implicits._

  test("gate passes small inputs unchanged and throws above the guard") {
    val df = spark.range(10).toDF("id")
    assert(Controls.gate(df, "x", max = 10L).count() == 10)
    val e = intercept[IllegalArgumentException] {
      Controls.gate(df, "dd2_ngram_jaccard", max = 9L)
    }
    assert(e.getMessage.contains("CONTROL") &&
      e.getMessage.contains("dd2_ngram_jaccard"))
  }

  test("default guard admits the test corpora (dd2/ss1 stay runnable)") {
    val sh = DedupQueries.shingleRowsOf(
      graft.sources.Tables.documents(spark, "/root/testdata/sf0.001"))
    assert(Controls.gate(sh, "dd2_ngram_jaccard", "/root/testdata/sf0.001").count() > 0)
  }
}
