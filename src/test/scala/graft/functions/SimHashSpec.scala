package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.SimHash.simhash64

class SimHashSpec extends SparkSpec {
  import spark.implicits._

  private def hashOf(tokens: Seq[String]): Long =
    Seq(tokens).toDF("t").select(simhash64($"t")).collect()(0).getLong(0)

  test("deterministic across invocations and plans") {
    val t = Seq("the", "quick", "brown", "fox")
    assert(hashOf(t) == hashOf(t))
  }

  test("bag semantics: token order does not change the hash") {
    val a = Seq("alpha", "beta", "gamma", "delta")
    assert(hashOf(a) == hashOf(a.reverse))
  }

  test("near-identical token sets land at small Hamming distance") {
    val base = (1 to 60).map(i => s"tok$i")
    val changed = base.updated(30, "different")
    val d = java.lang.Long.bitCount(hashOf(base) ^ hashOf(changed))
    assert(d <= 12, s"hamming distance $d too large for a 1-token change")
  }

  test("unrelated token sets land far apart") {
    val a = (1 to 60).map(i => s"aaa$i")
    val b = (1 to 60).map(i => s"zzz$i")
    val d = java.lang.Long.bitCount(hashOf(a) ^ hashOf(b))
    assert(d >= 15, s"hamming distance $d suspiciously small for unrelated docs")
  }

  test("stays inside whole-stage codegen") {
    val df = spark.range(100)
      .select(simhash64(array(concat(lit("tok"), $"id"), lit("x"))).as("h"))
    // `*(n)` prefixes mark operators fused into a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [simhash64"), s"expected codegen'd project in:\n$plan")
    // and the generated code actually runs (no CodegenFallback path)
    assert(df.distinct().count() > 90)
  }

  test("dd4 finds the planted near-duplicates that dd2 (jaccard) finds") {
    val d = "/root/testdata/sf0.001"
    val dd2 = graft.operators.DedupQueries.queries("dd2_ngram_jaccard")(spark, d)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val dd4 = graft.operators.DedupQueries.queries("dd4_simhash")(spark, d)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dd2.nonEmpty, "fixture should contain planted near-dups")
    val recall = dd2.intersect(dd4).size.toDouble / dd2.size
    assert(recall >= 0.8, s"simhash recall vs jaccard pairs too low: $recall ($dd4 vs $dd2)")
  }
}
