package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Bloom
import graft.sources.Tables

/** q20's contract: the bloom prune must be INVISIBLE in the result (false
  * positives removed by the exact semi-join, false negatives impossible)
  * while actually dropping probe-side rows before the shuffle. */
class BloomPruneSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q20 equals the unpruned semi-join") {
    import spark.implicits._
    val got = RelationalQueries.queries("q20_bloom_semi_join")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val dim = Tables.orders(spark, dir)
      .filter($"o_orderpriority" === "1-URGENT").select($"o_orderkey")
    val want = Tables.lineitem(spark, dir)
      .join(dim, $"l_orderkey" === $"o_orderkey", "left_semi")
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        graft.functions.Exact.dsum($"l_quantity").as("sum_qty"),
        graft.functions.Exact.dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"))
          .as("revenue"))
      .orderBy($"l_returnflag")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("the bloom prune is sound and selective") {
    import spark.implicits._
    val dim = Tables.orders(spark, dir)
      .filter($"o_orderpriority" === "1-URGENT").select($"o_orderkey")
    val bloom = dim.agg(Bloom.bloomAgg($"o_orderkey", 100000L, 1L << 20))
      .head.getAs[Array[Byte]](0)
    val fact = Tables.lineitem(spark, dir)
    val total = fact.count()
    val pruned = fact.filter(Bloom.mightContain(bloom, $"l_orderkey"))
    val exact = fact.join(dim, $"l_orderkey" === $"o_orderkey", "left_semi")
    val nPruned = pruned.count()
    val nExact = exact.count()
    // no false negatives: every true match survives the prune
    assert(pruned.join(dim, $"l_orderkey" === $"o_orderkey", "left_semi")
      .count() == nExact)
    // sound bounds: exact ⊆ pruned ⊂ all, and the prune does real work
    assert(nExact <= nPruned)
    assert(nPruned < total,
      s"bloom prune dropped nothing ($nPruned of $total rows survived)")
    // at these sizes the fpp is tiny — the pruned set should sit near the
    // exact selectivity, not near the full scan
    assert(nPruned < (total * 6) / 10,
      s"prune too weak: $nPruned of $total survived for $nExact true matches")
  }

  test("blob size is fixed by the bits parameter, not the row count") {
    import spark.implicits._
    def blobFor(rows: Int): Int = {
      val df = spark.range(rows.toLong).select($"id".as("k"))
      df.agg(Bloom.bloomAgg($"k", 1000L, 1L << 15)).head.getAs[Array[Byte]](0).length
    }
    assert(blobFor(10) == blobFor(5000))
  }
}
