package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Count-min-sketch (tx14) invariants: one-sided error (estimates never
  * undercount — the defining CMS guarantee), exact agreement with an
  * independent driver-side sketch built from the same md5 row hashes, and
  * exact-count ordering of the reported heavy hitters. */
class CmsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Independent CMS probe — reimplements the hash from its definition
    * (md5 of the row-salted token, first 8 hex digits, mod width) without
    * sharing the query's Column expressions. */
  private def cell(i: Int, t: String, width: Int): Long = {
    val md = MessageDigest.getInstance("MD5")
      .digest(s"cms$i:$t".getBytes(StandardCharsets.UTF_8))
    val hex = md.map(b => f"$b%02x").mkString.substring(0, 8)
    java.lang.Long.parseLong(hex, 16) % width
  }

  test("tx14 estimates equal an independent driver-side sketch and never undercount") {
    import spark.implicits._
    val depth = 4
    val width = 512
    val tokens = graft.sources.Tables.documents(spark, dir)
      .select(explode(TextQueries.wsTokens($"text")).as("t"))
      .collect().map(_.getString(0))
    // driver-side sketch: every occurrence increments one cell per row
    val cells = scala.collection.mutable.Map.empty[(Int, Long), Long]
    tokens.foreach { t =>
      (0 until depth).foreach { i =>
        val k = (i, cell(i, t, width))
        cells(k) = cells.getOrElse(k, 0L) + 1L
      }
    }
    val exact = tokens.groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val rows = TextQueries.queries("tx14_cms_topk")(spark, dir).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val t = r.getString(0)
      assert(r.getLong(1) == exact(t), s"exact count for '$t'")
      val est = (0 until depth).map(i => cells((i, cell(i, t, width)))).min
      assert(r.getLong(2) == est, s"sketch estimate for '$t'")
      assert(r.getLong(3) == est - exact(t))
      assert(r.getLong(3) >= 0L, s"CMS undercounted '$t'")
    }
    // reported heavy hitters are ordered by exact count desc, then term,
    // and really are the global top of the exact distribution
    val reported = rows.map(r => (r.getLong(1), r.getString(0)))
    assert(reported.sortBy { case (c, t) => (-c, t) }.toSeq == reported.toSeq)
    val trueTop = exact.toSeq.sortBy { case (t, c) => (-c, t) }
      .take(20).map { case (t, c) => (c, t) }
    assert(reported.toSeq == trueTop)
    // the sketch is bounded by construction: depth×width cells regardless
    // of vocabulary size (the driver mirror proves the keyspace bound)
    assert(cells.size <= depth * width)
  }
}
