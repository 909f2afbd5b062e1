package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ss18 SQ fidelity audit: planted exact-quantization cases + corpus
  * bounds. The hash oracle pins every value; these pin the semantics on
  * vectors small enough to quantize by hand. */
class SqFidelitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("ss18 planted vectors score as hand-quantized") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("ss18-planted").toString
    def pad(v: Seq[Float]) = v ++ Seq.fill(8 - v.size)(0.0f)
    Seq(
      (0L, pad(Seq(0.0f)), 0),          // zero vector: lossless by definition
      (1L, pad(Seq(1.0f)), 0),          // axis vector: q=(127,0,..) reconstructs exactly
      (2L, pad(Seq(3.0f, 4.0f)), 0))    // q=(95,127): known rounding error
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val got = SimilarityQueries.queries("ss18_sq_fidelity")(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(0L) == ((0.0, 0L, 1.0)))
    assert(got(1L) == ((1.0, 127L * 127L, 1.0)))
    // q2 = floor(3*127/4 + 0.5) = 95, q4 = 127; dot = 3*95 + 4*127 = 793
    val (scale2, qn2, cos2) = got(2L)
    assert(scale2 == 4.0)
    assert(qn2 == 95L * 95L + 127L * 127L)
    assert(cos2 == 793.0 / (5.0 * math.sqrt(25154.0)))
    assert(cos2 < 1.0 && cos2 > 0.999, s"int8 error should be tiny: $cos2")
  }

  test("ss18 corpus bounds: every vector reconstructs above 0.95 cosine") {
    val rows = SimilarityQueries.queries("ss18_sq_fidelity")(spark, dir).collect()
    assert(rows.length == graft.sources.Tables.embeddings(spark, dir).count())
    rows.foreach { r =>
      val (scale, qn, cos) = (r.getDouble(1), r.getLong(2), r.getDouble(3))
      assert(scale > 0.0, "driver corpus has no zero vectors")
      assert(qn > 0L && qn <= 64L * 127L * 127L)
      assert(cos > 0.95 && cos <= 1.0 + 1e-12,
        s"vec ${r.getLong(0)} fidelity $cos out of range")
    }
  }
}
