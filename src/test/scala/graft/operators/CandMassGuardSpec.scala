package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions.sum

import graft.SparkSpec

/** Round-12 candidate-mass pre-flight: the index-driven candidate families
  * (prefix containment dd7/dd10, banded LSH dd3/dd8/dd9, SimHash pigeonhole
  * dd4) refuse to launch their candidate join when the EXACT pre-distinct
  * join size — read off the at-rest indexes, dd21/dd15's own quantity —
  * exceeds `spark.graft.containment.maxCandMass`. The sf1 rung measured
  * this family growing ~N² on a vocabulary-saturated corpus; round 11 had
  * the instrument (dd21/dd15) but no seatbelt. The guard must fire on a
  * planted saturated corpus, stay invisible on a Heaps-like one at the
  * SAME setting, and equal dd21's histogram total bit-for-bit. */
class CandMassGuardSpec extends SparkSpec {
  import spark.implicits._

  /** Every document is the SAME text → every shingle's df equals the
    * corpus size, every MinHash signature and SimHash collide — the
    * sf1-rung saturation regime in miniature (candidate sets ~N²). */
  private lazy val saturated: String = {
    val d = Files.createTempDirectory("graft-sat").toString
    (1L to 60L).map(i => (i, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  /** Per-document unique vocabulary → df = 1 everywhere, zero candidate
    * mass: what Heaps'-law text looks like to these indexes. */
  private lazy val heaps: String = {
    val d = Files.createTempDirectory("graft-heaps").toString
    (1L to 60L).map(i => (i, (1 to 5).map(j => s"w${i}x$j").mkString(" ")))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private def withGuard(max: Long)(body: => Unit): Unit = {
    val saved = spark.conf.getOption(Controls.CandMassKey)
    spark.conf.set(Controls.CandMassKey, max.toString)
    try body
    finally saved.fold(spark.conf.unset(Controls.CandMassKey))(
      spark.conf.set(Controls.CandMassKey, _))
  }

  private val gated = Seq("dd3_minhash_lsh", "dd4_simhash",
    "dd7_prefix_containment", "dd8_minhash_estimate", "dd9_online_dedup",
    "dd10_online_containment")

  test("every gated query throws on a saturated corpus under a tight guard") {
    withGuard(50L) {
      gated.foreach { q =>
        val e = intercept[IllegalArgumentException] {
          DedupQueries.queries(q)(spark, saturated).collect()
        }
        assert(e.getMessage.contains("VOCABULARY-SATURATION") &&
          e.getMessage.contains(q), s"$q: ${e.getMessage}")
      }
    }
  }

  test("the same guard setting is invisible on a Heaps-like corpus") {
    withGuard(50L) {
      gated.foreach { q =>
        // must not throw — candidate mass is ~0 when df stays at 1
        DedupQueries.queries(q)(spark, heaps).collect()
      }
    }
  }

  test("dd7's gate mass IS dd21's histogram total, bit-for-bit") {
    val dir = "/root/testdata/sf0.001"
    val total = DedupQueries.queries("dd21_prefix_profile")(spark, dir)
      .agg(sum($"cand_mass")).head.getLong(0)
    // one below the exact mass: must throw, and the message must carry the
    // exact dd21 total (pins gate mass == instrument total, no estimate)
    withGuard(total - 1) {
      val e = intercept[IllegalArgumentException] {
        DedupQueries.queries("dd7_prefix_containment")(spark, dir).collect()
      }
      assert(e.getMessage.contains(s"candidate mass $total "),
        s"expected exact mass $total in: ${e.getMessage}")
    }
    // at exactly the mass: inclusive bound, the join launches
    withGuard(total) {
      DedupQueries.queries("dd7_prefix_containment")(spark, dir).collect()
    }
  }

  test("default guard admits the test corpora (all gated queries runnable)") {
    gated.foreach { q =>
      DedupQueries.queries(q)(spark, "/root/testdata/sf0.001").collect()
    }
  }
}
