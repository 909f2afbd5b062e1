package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** dd21 prefix-candidate mass profile: the histogram total must equal the
  * DIRECTLY-counted pre-distinct candidate join of the containment family
  * (the dd15 discipline: the pre-flight IS the shuffle size, not an
  * estimate), and every prefix row appears in exactly one df bucket. */
class PrefixProfileSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("histogram mass equals the directly-counted candidate join") {
    import spark.implicits._
    val prof = DedupQueries.queries("dd21_prefix_profile")(spark, dir).collect()
    val mass = prof.map(_.getLong(2)).sum
    val nRows = prof.map(_.getLong(1)).sum
    // direct count: prefix rows joined against the live shingle index,
    // self-probes excluded — dd7's candidate join before distinct
    val sh = DedupQueries.shingles(spark, dir)
    val direct = DedupQueries.containPrefix(spark, dir).filter($"core")
      .join(sh.select($"doc_id".as("d2"), $"sg"), "sg")
      .filter($"d1" =!= $"d2")
      .count()
    assert(mass == direct, s"profile mass $mass != direct candidate count $direct")
    // row conservation: every at-rest prefix row lands in exactly one bucket
    val nPrefix = DedupQueries.containPrefix(spark, dir).filter($"core").count()
    assert(nRows == nPrefix, s"histogram rows $nRows != prefix rows $nPrefix")
    // df buckets are positive and strictly increasing (ORDER BY df)
    val dfs = prof.map(_.getLong(0))
    assert(dfs.forall(_ >= 1) && dfs.zip(dfs.tail).forall { case (a, b) => a < b })
  }

  test("dd22 pair-histogram mass equals the directly-counted escalated join") {
    import spark.implicits._
    val prof = DedupQueries.queries("dd22_pair_profile")(spark, dir).collect()
    val mass = prof.map(_.getLong(2)).sum
    val nPairs = prof.map(_.getLong(1)).sum
    // direct count: the escalated route's pair part — u+2-prefix pairs
    // probing the pair posting index, self-probes excluded
    val pref = DedupQueries.containPrefix(spark, dir)
    val prefPairs = pref.select($"d1", $"sg".as("g1"))
      .join(pref.select($"d1", $"sg".as("g2")), Seq("d1"))
      .filter($"g1" < $"g2")
    val direct = prefPairs
      .join(DedupQueries.docPairs(spark, dir)
          .select($"doc_id".as("d2"), $"pk"),
        xxhash64($"g1", $"g2") === $"pk")
      .filter($"d1" =!= $"d2")
      .count()
    assert(mass == direct, s"pair profile mass $mass != direct count $direct")
    // row conservation: every prefix pair appears in exactly one bucket
    assert(nPairs == prefPairs.count(),
      s"histogram rows $nPairs != prefix pairs ${prefPairs.count()}")
  }
}
