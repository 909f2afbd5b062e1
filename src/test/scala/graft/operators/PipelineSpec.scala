package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Fingerprint.fingerprintMd5
import graft.sources.Tables

/** Stage-composition invariants for the curation pipeline: p01 must agree
  * with the individually-verified stages it chains (tx2 scoring, dd1
  * fingerprint identity) — the hash oracle pins the end result; these pin
  * the internal consistency. */
class PipelineSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("p01 per-source totals recompose from tx2 scores and dd1 fingerprints") {
    import spark.implicits._
    val p01 = PipelineQueries.queries("p01_curation")(spark, dir).collect()
    assert(p01.nonEmpty)

    // recompute the gate from the DECLARED tx2 output joined back to source
    val tx2 = TextQueries.queries("tx2_quality_score")(spark, dir)
      .select($"doc_id", $"quality", $"n_tokens")
    val src = Tables.documents(spark, dir).select($"doc_id", $"source", $"text")
    val gated = tx2.join(src, "doc_id")
      .filter($"quality" >= 0.5 && $"n_tokens" <= 5000L)
    val nGated = gated.groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    // dd1 identity: kept docs are exactly the per-fingerprint minima
    val kept = gated
      .withColumn("fp", fingerprintMd5($"text"))
      .groupBy($"fp").agg(min($"doc_id").as("doc_id"))
      .join(gated, "doc_id")
    val nKept = kept.groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    p01.foreach { r =>
      val s = r.getString(0)
      assert(r.getLong(1) == nGated(s), s"n_gated mismatch for $s")
      assert(r.getLong(2) == nKept.getOrElse(s, 0L), s"n_kept mismatch for $s")
      assert(r.getLong(2) <= r.getLong(1), s"kept exceeds gated for $s")
    }
  }
}
