package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Unit semantics of the backward as-of join: at-or-before matching,
  * same-timestamp inclusion, deterministic tie-break, null on no-match —
  * plus the plan property the operator exists for (no Join node: one
  * window pass, one shuffle). */
class AsOfSpec extends SparkSpec {

  private def t(s: Long) = new Timestamp(s * 1000L)

  test("at-or-before, same-ts match, greatest-id tie-break, null when none") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, t(100), 5.0), // view at exactly ts 100 matches
      (2L, 10L, t(50), 6.0), // latest earlier view (ts 40)
      (3L, 10L, t(10), 7.0), // nothing at-or-before → null
      (4L, 11L, t(500), 8.0)) // two views tie at ts 400 → greatest id
      .toDF("event_id", "user_id", "ts", "value")
    val right = Seq(
      (20L, 10L, t(40)),
      (21L, 10L, t(100)),
      (30L, 11L, t(400)),
      (31L, 11L, t(400)))
      .toDF("event_id", "user_id", "ts")

    val out = AsOf.joinBackward(left, right, Seq("user_id"), "ts", "event_id",
      Seq("event_id"))
    val got = out.collect()
      .map(r => r.getLong(0) -> Option(r.get(4)).map(_.asInstanceOf[Long]))
      .toMap
    assert(got === Map(
      1L -> Some(21L),
      2L -> Some(20L),
      3L -> None,
      4L -> Some(31L)))
  }

  test("payload is carried atomically: null fields never mix right rows") {
    import spark.implicits._
    val left = Seq((1L, 10L, t(100), 0.0)).toDF("event_id", "user_id", "ts", "value")
    // latest right row (ts 90) has a NULL price: the match must carry
    // (id=21, price=null), never id=21 with the ts=40 row's price
    val right = Seq(
      (20L, 10L, t(40), Some(9.0)),
      (21L, 10L, t(90), Option.empty[Double]))
      .toDF("event_id", "user_id", "ts", "price")
    val out = AsOf.joinBackward(left, right, Seq("user_id"), "ts", "event_id",
      Seq("event_id", "price")).collect()(0)
    assert(out.getLong(4) == 21L)
    assert(out.isNullAt(5), s"price must be the matched row's null, got ${out.get(5)}")
  }

  test("nearest: direction choice, exact tie -> backward, one-sided nulls") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, t(100)), // back at 95 (d=5) beats fwd at 110 (d=10)
      (2L, 10L, t(108)), // fwd at 110 (d=2) beats back at 95 (d=13)
      (3L, 11L, t(100)), // only a forward candidate exists
      (4L, 12L, t(100)), // no candidates at all
      (5L, 13L, t(100))) // exact tie (90 vs 110): backward must win
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (20L, 10L, t(95)), (21L, 10L, t(110)),
      (30L, 11L, t(140)),
      (50L, 13L, t(90)), (51L, 13L, t(110)))
      .toDF("event_id", "user_id", "ts")
    val out = AsOf.joinNearest(left, right, Seq("user_id"), "ts", "event_id",
      Seq("event_id")).collect()
      .map(r => r.getLong(0) ->
        ((Option(r.get(3)), Option(r.get(5)), Option(r.get(6))))).toMap
    assert(out(1L) == ((Some(20L), Some(5000000L), Some("backward"))))
    assert(out(2L) == ((Some(21L), Some(2000000L), Some("forward"))))
    assert(out(3L) == ((Some(30L), Some(40000000L), Some("forward"))))
    assert(out(4L) == ((None, None, None)))
    assert(out(5L) == ((Some(50L), Some(10000000L), Some("backward"))))
  }

  test("nearest rejects clashing output columns up front") {
    import spark.implicits._
    val left = Seq((1L, 10L, t(100), 0L))
      .toDF("event_id", "user_id", "ts", "nearest_event_id")
    val right = Seq((20L, 10L, t(95))).toDF("event_id", "user_id", "ts")
    val e = intercept[IllegalArgumentException] {
      AsOf.joinNearest(left, right, Seq("user_id"), "ts", "event_id",
        Seq("event_id"))
    }
    assert(e.getMessage.contains("nearest_event_id"))
  }

  test("nearest rejects clashing fixed-output and working columns too") {
    import spark.implicits._
    val right = Seq((20L, 10L, t(95))).toDF("event_id", "user_id", "ts")
    // the fixed outputs (nearest_dist_us / nearest_dir) and the two-pass
    // working columns (nearest_bk_<c>) would silently duplicate or corrupt
    // if present on the left — each must fail the up-front require
    Seq("nearest_dist_us", "nearest_dir", "nearest_bk_event_id",
      "nearest_bk_ts").foreach { bad =>
      val left = Seq((1L, 10L, t(100), 0L))
        .toDF("event_id", "user_id", "ts", bad)
      val e = intercept[IllegalArgumentException] {
        AsOf.joinNearest(left, right, Seq("user_id"), "ts", "event_id",
          Seq("event_id"))
      }
      assert(e.getMessage.contains(bad), s"guard missed $bad: ${e.getMessage}")
    }
  }

  test("plan is join-free: union + single window, no range-join explosion") {
    val p = AsOfQueries.queries("a01_asof_attribution")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"as-of must compile to union+window, got:\n${p.take(1500)}")
    assert(p.contains("Window"), p.take(1500))
  }
}
