package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** dd7 prefix-filtered containment join: the prefix filter is an
  * OPTIMIZATION, never a semantics change — the candidate restriction must
  * be lossless for the declared threshold. These tests pin that against a
  * prefix-free exhaustive recompute, plus the asymmetry that distinguishes
  * containment from Jaccard near-dup. */
class ContainmentSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Exhaustive containment pairs, NO prefix filter: every shared-shingle
    * pair (the dd2 shape), then the same integer threshold. */
  private def naivePairs: Set[(Long, Long, Long, Long)] = {
    import spark.implicits._
    val sh = Tables.documents(spark, dir)
      .select($"doc_id", filter(split(lower(trim($"text")), "\\s+"), t => length(t) > 0).as("w"))
      .select($"doc_id",
        explode(when(size($"w") >= 3,
          transform(sequence(lit(1), size($"w") - 2), i =>
            concat_ws(" ", element_at($"w", i), element_at($"w", i + 1), element_at($"w", i + 2))))
          .otherwise(array().cast("array<string>"))).as("sg"))
      .distinct()
    val shared = sh.select($"doc_id".as("d1"), $"sg")
      .join(sh.select($"doc_id".as("d2"), $"sg"), "sg")
      .filter($"d1" =!= $"d2")
      .groupBy($"d1", $"d2").agg(count(lit(1)).as("shared"))
    val sizes = sh.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    shared.join(sizes.select($"doc_id".as("d1"), $"n".as("n1")), "d1")
      .filter($"shared" * 10 >= $"n1" * 9)
      .select($"d1", $"d2", $"n1", $"shared")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
  }

  test("dd7 prefix filtering is lossless: exactly the exhaustive containment pairs") {
    val dd7 = DedupQueries.queries("dd7_prefix_containment")(spark, dir)
      .select("d1", "d2", "n1", "shared")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val naive = naivePairs
    assert(dd7 == naive,
      s"missed=${naive.diff(dd7).take(5)} extra=${dd7.diff(naive).take(5)}")
    assert(dd7.nonEmpty, "fixture must produce at least one containment pair")
  }

  test("dd7 is asymmetric: a small-doc-in-big-doc pair holds in one direction only") {
    val pairs = DedupQueries.queries("dd7_prefix_containment")(spark, dir)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val oneWay = pairs.filter { case (a, b) => !pairs.contains((b, a)) }
    assert(oneWay.nonEmpty,
      "expected at least one one-directional containment pair (Jaccard-invisible)")
  }
}
