package graft.operators

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-13 saturation escalation for the SimHash pigeonhole (dd4): the
  * 2-of-5 block-pair witness route must return EXACTLY the 4×16-bit
  * single-chunk route's rows — the candidate sets differ, the Hamming
  * verify makes the results identical. Pinned on:
  *
  *  - the driver sf0.001 corpus (the real dd4 query under both forced
  *    routes), and
  *  - crafted hash sets exercising the pigeonhole theorem's edges: three
  *    flipped bits in three DIFFERENT blocks (the pair route's worst case
  *    — exactly two blocks survive), flips straddling a block boundary,
  *    Hamming-4 pairs (must be excluded), equal hashes, and a seeded
  *    random set brute-force-checked for candidate completeness.
  *
  * The route is flipped via [[Controls.SimhashEscalateKey]]: a huge value
  * pins single-chunk, 0 forces the pair route on any corpus. */
class Dd4RouteEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  private def withFanout(v: String)(body: => DataFrame): Seq[String] = {
    val saved = spark.conf.getOption(Controls.SimhashEscalateKey)
    spark.conf.set(Controls.SimhashEscalateKey, v)
    try body.collect().map(_.toString).sorted.toSeq
    finally saved.fold(spark.conf.unset(Controls.SimhashEscalateKey))(
      spark.conf.set(Controls.SimhashEscalateKey, _))
  }

  test("dd4 identical under forced pair route on the driver corpus, non-empty") {
    val d = "/root/testdata/sf0.001"
    val single = withFanout("1e18")(DedupQueries.queries("dd4_simhash")(spark, d))
    val pair = withFanout("0.0")(DedupQueries.queries("dd4_simhash")(spark, d))
    assert(single == pair,
      s"pair route (${pair.size} rows) != single route (${single.size} rows)")
    assert(single.nonEmpty, "planted exact dups must collide at Hamming 0")
  }

  /** Every Hamming-≤3 pair the banding's self-join surfaces, by brute
    * force over the banded candidates (the dd4 tail without the distinct —
    * completeness is what's at stake, multiplicity is removed the same way
    * dd4 removes it). */
  private def foundPairs(bands: DataFrame, keys: Seq[String]): Set[(Long, Long, Long)] = {
    val l = bands.select(col("doc_id").as("d1") +: col("sh").as("sh1") +:
      keys.map(col): _*)
    val r = bands.select(col("doc_id").as("d2") +: col("sh").as("sh2") +:
      keys.map(col): _*)
    l.join(r, keys).filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2"),
        expr("bit_count(sh1 ^ sh2)").cast("long").as("hd"))
      .filter(col("hd") <= 3)
      .distinct().collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getLong(2))).toSet
  }

  private def brutePairs(hashes: Seq[(Long, Long)]): Set[(Long, Long, Long)] =
    (for {
      (id1, h1) <- hashes; (id2, h2) <- hashes
      if id1 < id2
      hd = java.lang.Long.bitCount(h1 ^ h2).toLong
      if hd <= 3
    } yield (id1, id2, hd)).toSet

  private def checkComplete(hashes: Seq[(Long, Long)]): Unit = {
    val df = hashes.toDF("doc_id", "sh")
    val expected = brutePairs(hashes)
    val single = foundPairs(DedupQueries.simhashSingleBands(df), Seq("band", "chunk"))
    val pair = foundPairs(DedupQueries.simhashPairBands(df), Seq("band", "v1", "v2"))
    assert(single == expected,
      s"single route incomplete: missing ${expected -- single}, extra ${single -- expected}")
    assert(pair == expected,
      s"pair route incomplete: missing ${expected -- pair}, extra ${pair -- expected}")
  }

  test("crafted hashes: 3 flips across 3 different blocks (pair worst case)") {
    val base = 0xDEADBEEFCAFEBABEL
    checkComplete(Seq(
      1L -> base,
      2L -> (base ^ (1L << 5) ^ (1L << 20) ^ (1L << 60)), // blocks 0,1,4
      3L -> (base ^ (1L << 0) ^ (1L << 1) ^ (1L << 2)), // one block
      4L -> (base ^ (1L << 12) ^ (1L << 13) ^ (1L << 14)), // block boundary
      5L -> (base ^ (1L << 3) ^ (1L << 17) ^ (1L << 33) ^ (1L << 50)), // hd=4
      6L -> base, // exact duplicate, hd=0
      7L -> (base ^ (1L << 13) ^ (1L << 26) ^ (1L << 39)), // blocks 1,2,3
      8L -> ~base)) // hd=64
  }

  test("seeded random hash set: both routes brute-force complete") {
    val rnd = new Random(42)
    // cluster the hashes so Hamming-≤3 pairs actually exist: 40 seeds,
    // each with 4 perturbations of 0-4 random bit flips
    val hashes = (0 until 40).flatMap { s =>
      val seed = rnd.nextLong()
      (0 until 4).map { k =>
        val flips = (0 until rnd.nextInt(5)).map(_ => 1L << rnd.nextInt(64))
        (s * 4L + k, flips.foldLeft(seed)(_ ^ _))
      }
    }
    val expected = brutePairs(hashes)
    assert(expected.nonEmpty, "test corpus must contain close pairs")
    checkComplete(hashes)
  }
}
