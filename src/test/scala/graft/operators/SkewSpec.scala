package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Salted-join equivalence: the salting must be result-invisible for ANY
  * salt factor (the declared q15 oracle only pins salt=8). */
class SkewSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("saltedJoin is row-identical to the plain join for salt 1/3/8") {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
      .select($"l_orderkey".as("o_orderkey"), $"l_linenumber", $"l_quantity")
    val ord = Tables.orders(spark, dir).select($"o_orderkey", $"o_orderpriority")
    val plain = li.join(ord, "o_orderkey")
    for (salt <- Seq(1, 3, 8)) {
      val salted = Skew.saltedJoin(li, ord, Seq("o_orderkey"), salt,
        saltBy = hash($"o_orderkey", $"l_linenumber"))
      assert(salted.columns.sorted.sameElements(plain.columns.sorted))
      val cols = plain.columns.toSeq
      assert(salted.select(cols.map(col): _*).exceptAll(plain).isEmpty &&
        plain.exceptAll(salted.select(cols.map(col): _*)).isEmpty,
        s"salt=$salt result differs from plain join")
    }
  }

  test("saltedJoin rejects bad salt and reserved columns") {
    import spark.implicits._
    val l = Seq((1L, 1L)).toDF("k", "v")
    val r = Seq((1L, 2L)).toDF("k", "w")
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(l, r, Seq("k"), 0, saltBy = $"v")
    }
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(l.withColumnRenamed("v", "graft_salt"), r, Seq("k"), 2, saltBy = $"k")
    }
  }

  test("measured: salting bounds the hot-key shuffle partition row count") {
    import spark.implicits._
    // synthetic 90%-hot-key distribution: 45k rows on key 7, a 100-key
    // uniform tail of 5k — the shape AQE's skew split can't fix when the
    // join feeds a same-key groupBy
    val P = 32 // reducers
    val S = 8  // q15's salt factor
    val probe = spark.range(45000).select(lit(7L).as("k"), $"id".as("line"))
      .unionAll(spark.range(5000).select(($"id" % 100 + 100).as("k"), $"id".as("line")))
    // partition assignment is computed with Spark's own formula —
    // HashPartitioning.partitionIdExpression IS Pmod(Murmur3Hash(keys), n),
    // and functions.hash IS Murmur3Hash — so these row counts are exactly
    // what each shuffle reducer of the join would receive (plain join
    // shuffles on k; salted join shuffles on (k, graft_salt))
    def maxPartRows(partId: org.apache.spark.sql.Column): Long =
      probe.groupBy(partId.as("p")).count().agg(max($"count")).head.getLong(0)
    val plainMax = maxPartRows(pmod(hash($"k"), lit(P)))
    val saltBucket = pmod(hash(hash($"k", $"line")), lit(S))
    val saltedMax = maxPartRows(pmod(hash($"k", saltBucket), lit(P)))
    info(s"max shuffle-partition rows: plain=$plainMax salted=$saltedMax " +
      f"(${plainMax.toDouble / saltedMax}%.1fx reduction, theoretical bound ${S}x)")
    assert(plainMax >= 45000, "the hot key must land in one plain partition")
    assert(plainMax > 3L * saltedMax,
      s"salt=$S must cut the hottest partition by >3x: plain=$plainMax salted=$saltedMax")
  }

  test("salting actually spreads a hot key across buckets") {
    import spark.implicits._
    // one key, many rows with distinct discriminators
    val hot = (1 to 64).map(i => (7L, i.toLong)).toDF("k", "line")
    val dim = Seq((7L, "x")).toDF("k", "name")
    val out = Skew.saltedJoin(hot, dim, Seq("k"), 8, saltBy = $"line")
    assert(out.count() == 64)
    // the internal bucket assignment covers more than one bucket
    val buckets = hot.select(pmod(hash($"line"), lit(8)).as("b"))
      .distinct().count()
    assert(buckets > 1, "hash discriminator failed to spread the hot key")
  }
}
