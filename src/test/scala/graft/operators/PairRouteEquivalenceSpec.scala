package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Round-13 saturation escalation: the containment family's PAIR-witness
  * route (u+2-prefix pairs probing the shingle-pair index) must return
  * EXACTLY the single-witness route's rows — the candidate sets differ,
  * the exact verify makes the results identical. Pinned on:
  *
  *  - the driver sf0.001 corpus (real query shapes dd7/dd10), and
  *  - a planted corpus exercising every theorem edge: full containment
  *    (small-in-big), the exact 9/10 boundary, just-below threshold, an
  *    n=1 document contained in a bigger one (the pairless residual
  *    route), an n=1 orphan, and unrelated documents.
  *
  * The route is flipped via [[Controls.EscalateFanoutKey]]: a huge value
  * pins single-witness, 0 forces pair-witness on any corpus. */
class PairRouteEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val planted: String = {
    val d = Files.createTempDirectory("graft-pair-eq").toString
    val words = (0 until 60).map(i => s"w$i")
    def txt(ix: Seq[Int]) = ix.map(words).mkString(" ")
    val big = 0 until 22 // 20 shingles
    Seq(
      (1L, txt(big)), // the container
      (2L, txt(big.take(21))), // 19 shingles, all inside 1: C(2→1) = 1.0
      (3L, txt(big.take(12))), // 10 shingles, all inside 1: C = 1.0
      (4L, txt(big.take(11) :+ 30)), // 10 shingles, 9 shared: C = 0.9 boundary
      (5L, txt(Seq(5, 6, 7))), // n=1 doc, its shingle inside 1: C = 1.0
      (6L, txt(Seq(30, 31, 32))), // n=1 orphan
      (7L, txt(50 until 60)), // unrelated
      (8L, txt(big.drop(2))), // 18 shingles, all inside 1: C = 1.0
      (9L, txt(big.take(10) ++ Seq(30, 31))) // 10 shingles, 8 shared: C = 0.8
    ).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private def withFanout(v: String)(body: => DataFrame): Seq[String] = {
    val saved = spark.conf.getOption(Controls.EscalateFanoutKey)
    spark.conf.set(Controls.EscalateFanoutKey, v)
    try body.collect().map(_.toString).sorted.toSeq
    finally saved.fold(spark.conf.unset(Controls.EscalateFanoutKey))(
      spark.conf.set(Controls.EscalateFanoutKey, _))
  }

  private def check(q: String, d: String): Unit = {
    val single = withFanout("1e18")(DedupQueries.queries(q)(spark, d))
    val pair = withFanout("0.0")(DedupQueries.queries(q)(spark, d))
    assert(single == pair,
      s"$q: pair route (${pair.size} rows) != single route (${single.size} rows)\n" +
        s"single: ${single.take(5)}\npair: ${pair.take(5)}")
  }

  test("dd7/dd10 identical under forced pair route on the driver corpus") {
    check("dd7_prefix_containment", "/root/testdata/sf0.001")
    check("dd10_online_containment", "/root/testdata/sf0.001")
  }

  test("dd7 identical on the planted edge-case corpus, and non-empty") {
    val single = withFanout("1e18")(
      DedupQueries.queries("dd7_prefix_containment")(spark, planted))
    val pair = withFanout("0.0")(
      DedupQueries.queries("dd7_prefix_containment")(spark, planted))
    assert(single == pair, s"single: $single\npair: $pair")
    // the planted qualifying pairs must actually be found: d1 ∈ {2,3,5,8}
    // (containment ≥ 9/10 into doc 1), so the n=1 residual route is live
    val d1s = pair.map(_.split(",")(0).stripPrefix("[")).toSet
    assert(Set("2", "3", "5", "8").subsetOf(d1s),
      s"expected planted contained docs in results, got $d1s")
  }
}
