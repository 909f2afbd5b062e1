package graft.operators

import graft.SparkSpec

/** Skew-readiness of the (band, bucket-key) candidate joins (dd3/dd9/ss3/
  * ss9). A near-constant signature region — every document agreeing on one
  * band — produces a single pathologically hot shuffle key. These joins are
  * deliberately plain equi-joins with NO join hints, so AQE's runtime
  * skew-join split is free to act (the library-wide q15 salting operator
  * exists for the case AQE can't fix — a downstream same-key aggregation —
  * which the candidate joins don't have: their downstream groupBy is on the
  * PAIR, a different key). This suite proves the mechanism actually
  * engages on the candidate join shape with a synthetic hot bucket, and
  * that the split is pure execution — the candidate set is unchanged. */
class BandSkewSpec extends SparkSpec {
  import spark.implicits._

  test("a hot band bucket triggers the AQE skew-join split; candidates unchanged") {
    // thresholds scaled down to test-data sizes (defaults: 256 MB per
    // skewed partition); broadcast disabled so the join actually shuffles
    val conf = Seq(
      // enough width that the hot bucket stands out from the base load
      // (at the suite's width of 4, ~1/4 of the COLD rows land in the hot
      // partition and drown the skew signal)
      "spark.sql.shuffle.partitions" -> "64",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16384",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8192")
    val saved = conf.map { case (k, _) => k -> spark.conf.getOption(k) }
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one hot bucket (3000 docs share (0, "HOT") — a collapsed signature
      // region) + a healthy spread tail (10 docs per bucket)
      val hot = (0L until 3000L).map(i => (i, 0, "HOT"))
      val cold = (0L until 30000L).map(i => (i + 100000L, (i % 4).toInt, s"b${i % 3000}"))
      val bands = (hot ++ cold).toDF("doc_id", "band", "bh")
      def candidates = bands.select($"doc_id".as("d1"), $"band", $"bh")
        .join(bands.select($"doc_id".as("d2"), $"band", $"bh"), Seq("band", "bh"))
        .filter($"d1" < $"d2")
      val joined = candidates
      // execute THIS plan (count() would plan its own aggregate query and
      // leave joined's adaptive plan unfinalized)
      val n = joined.queryExecution.toRdd.count()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") || plan.contains("skewed"),
        s"AQE must split the hot bucket on the candidate join shape:\n${plan.take(2000)}")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      assert(candidates.count() == n,
        "the skew split must not change the candidate set")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(x => spark.conf.set(k, x))
    }
  }
}
