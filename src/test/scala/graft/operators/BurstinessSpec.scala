package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** a18 burstiness: planted dispersion regimes — a constant-rate user has
  * EXACTLY zero variance (fano_num = 0, integer), a spiky user is
  * over-dispersed, an alternating low-rate user under-dispersed, and the
  * integer num/den pair recomposes the double fano bit-exactly. */
class BurstinessSpec extends SparkSpec {

  private def ev(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("user_id", "day")
      .select($"user_id", to_timestamp($"day").as("ts"))
  }

  test("planted dispersion regimes classify exactly") {
    // user 1: 5 events on each of 4 days — zero variance
    val constant = for (d <- 1 to 4; _ <- 1 to 5) yield (1L, f"2024-01-0$d")
    // user 2: 10 events on day 1, then 1 on each of days 2-4 — bursty
    val spiky = (1 to 10).map(_ => (2L, "2024-01-01")) ++
      (2 to 4).map(d => (2L, f"2024-01-0$d"))
    // user 3: counts (1, 2) — variance 1/4 < mean 3/2, under-dispersed
    val mild = Seq((3L, "2024-01-01"), (3L, "2024-01-02"), (3L, "2024-01-02"))
    val out = SessionQueries.burstinessOf(ev(constant ++ spiky ++ mild))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getBoolean(6)))).toMap

    val (n1, e1, num1, den1, f1, b1) = out(1L)
    assert((n1, e1) == ((4L, 20L)))
    assert(num1 == 0L && den1 == 80L && f1 == 0.0 && !b1)

    // user 2: counts (10,1,1,1): n=4, sum=13, sumsq=103
    val (n2, e2, num2, den2, f2, b2) = out(2L)
    assert((n2, e2) == ((4L, 13L)))
    assert(num2 == 4 * 103 - 13 * 13 && den2 == 4 * 13)
    assert(b2 && f2 == num2.toDouble / den2.toDouble && f2 > 1.0)

    // user 3: counts (1,2): n=2, sum=3, sumsq=5 -> num=1, den=6
    val (n3, e3, num3, den3, f3, b3) = out(3L)
    assert((n3, e3) == ((2L, 3L)))
    assert(num3 == 1L && den3 == 6L && !b3 && f3 < 1.0)
  }

  test("fano_num is n^2 times the population variance, for any counts") {
    // cross-check the integer identity on a pseudo-random plant
    val rnd = new scala.util.Random(7)
    val rows = for {
      u <- 1L to 20L
      d <- 1 to 10
      n = 1 + rnd.nextInt(9)
      _ <- 1 to n
    } yield (u, f"2024-02-$d%02d")
    val byUser = rows.groupBy(_._1).map { case (u, rs) =>
      u -> rs.groupBy(_._2).map(_._2.size.toLong).toSeq
    }
    val out = SessionQueries.burstinessOf(ev(rows))
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    byUser.foreach { case (u, counts) =>
      val n = counts.size.toLong
      val sum = counts.sum
      val sq = counts.map(c => c * c).sum
      assert(out(u) == ((n * sq - sum * sum, n * sum)), s"user $u")
    }
  }
}
