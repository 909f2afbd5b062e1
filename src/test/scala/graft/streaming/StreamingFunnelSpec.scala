package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Streaming conversion-window funnel: depth resolution at the watermark,
  * earliest-in-window matching with the forward tie rule, window expiry,
  * and differential parity against a naive windowed recompute. */
class StreamingFunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)
  private val cols = Seq("user_id", "ts", "event_id", "kind")
  private val Win = 60L // seconds per stage

  /** Driver-side recompute of the exact windowed semantics. */
  private def naive(rows: Seq[(Long, Timestamp, Long, Int)])
      : Map[Long, (Option[Long], Option[Long], Int)] = {
    def of(k: Int) = rows.filter(_._4 == k)
      .map(r => (r._2.getTime, r._3, r._1)).sortBy(x => (x._1, x._2))
    val views = of(StreamingFunnel.View)
    val clicks = of(StreamingFunnel.Click)
    val purchases = of(StreamingFunnel.Purchase)
    views.map { case (vms, vid, u) =>
      val c = clicks.find(c => c._3 == u && c._1 >= vms && c._1 <= vms + Win * 1000)
      val p = c.flatMap(c0 => purchases.find(p =>
        p._3 == u && p._1 >= c0._1 && p._1 <= c0._1 + Win * 1000))
      vid -> (c.map(_._2), p.map(_._2), Seq(c, p).count(_.isDefined))
    }.toMap
  }

  test("depths 0/1/2 resolve; earliest-in-window click wins; windows expire") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Long, Int)]
    val out = StreamingFunnel.funnel(in.toDF().toDF(cols: _*), "30 seconds", Win)
    val q = out.writeStream.format("memory").queryName("funnel_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        // user 1: full funnel — view@100, clicks@130 & 110 (110 wins), purchase@150
        (1L, ts(100), 10L, 0), (1L, ts(130), 20L, 1), (1L, ts(110), 21L, 1),
        (1L, ts(150), 30L, 2),
        // user 2: click inside window but purchase outside click's window
        (2L, ts(100), 11L, 0), (2L, ts(120), 22L, 1), (2L, ts(400), 31L, 2),
        // user 3: the only click is outside the view's window
        (3L, ts(100), 12L, 0), (3L, ts(200), 23L, 1))
      q.processAllAvailable()
      in.addData((99L, ts(10000), 999L, 0)) // run the watermark out
      q.processAllAvailable()
      val rows = spark.table("funnel_out").filter($"user_id" =!= 99L)
        .select($"view_id", $"click_id", $"purchase_id", $"depth")
        .collect().map(r => r.getLong(0) ->
          ((Option(r.get(1)), Option(r.get(2)), r.getInt(3)))).toMap
      assert(rows(10L) == ((Some(21L), Some(30L), 2)), s"user 1: ${rows(10L)}")
      assert(rows(11L) == ((Some(22L), None, 1)), s"user 2: ${rows(11L)}")
      assert(rows(12L) == ((None, None, 0)), s"user 3: ${rows(12L)}")
    } finally q.stop()
  }

  test("a view stays pending until its candidate click is watermark-final") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Long, Int)]
    val out = StreamingFunnel.funnel(in.toDF().toDF(cols: _*), "30 seconds", Win)
    val q = out.writeStream.format("memory").queryName("funnel_pending")
      .outputMode(OutputMode.Append).start()
    try {
      // click@140 seen, but wm only reaches 110 — an earlier click could
      // still arrive, so NOTHING may be emitted yet
      in.addData((1L, ts(100), 10L, 0), (1L, ts(140), 20L, 1))
      q.processAllAvailable()
      assert(spark.table("funnel_pending").isEmpty,
        "must not resolve before the candidate is final")
      // the earlier click arrives within lateness and must win
      in.addData((1L, ts(115), 21L, 1))
      q.processAllAvailable()
      in.addData((99L, ts(10000), 999L, 0))
      q.processAllAvailable()
      val r = spark.table("funnel_pending").filter($"user_id" === 1L)
        .select($"click_id").collect()
      assert(r.length == 1 && r(0).getLong(0) == 21L,
        "the late-but-earlier click must be the match")
    } finally q.stop()
  }

  test("quiet key holding only unclaimed candidates is evicted (no leak)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Long, Int)]
    val out = StreamingFunnel.funnel(in.toDF().toDF(cols: _*), "30 seconds", Win)
    val q = out.writeStream.format("memory").queryName("funnel_leak")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1 clicks but never views: no stage pends, yet the click stays
      // buffered (an earlier view could still arrive). The regression was
      // that no timeout got registered for such keys, so eviction never ran
      // and the state row lived until query end.
      in.addData((1L, ts(100), 20L, 1))
      q.processAllAvailable()
      // march the watermark far past the click's lateness horizon
      Seq(10000L, 20000L, 30000L).foreach { s =>
        in.addData((99L, ts(s), 1000L + s, 0))
        q.processAllAvailable()
      }
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows == 1L,
        s"only user 99's last pending view may remain in state, got $stateRows rows")
    } finally q.stop()
  }

  test("sub-millisecond click ordering follows the batch microsecond rule") {
    implicit val sqlCtx = spark.sqlContext
    def tsUs(sec: Long, us: Long) = {
      val t = new Timestamp(sec * 1000); t.setNanos((us * 1000).toInt); t
    }
    val in = MemoryStream[(Long, Timestamp, Long, Int)]
    val out = StreamingFunnel.funnel(in.toDF().toDF(cols: _*), "30 seconds", Win)
    val q = out.writeStream.format("memory").queryName("funnel_subms")
      .outputMode(OutputMode.Append).start()
    try {
      // both clicks land on the SAME millisecond; id 21 is 200 µs earlier
      // and must win — ms-granular buffering would collapse them to a tie
      // and pick the smaller id 20, diverging from batch a06/a07
      in.addData((1L, ts(100), 10L, 0),
        (1L, tsUs(100, 500L), 20L, 1), (1L, tsUs(100, 300L), 21L, 1))
      q.processAllAvailable()
      in.addData((99L, ts(10000), 999L, 0))
      q.processAllAvailable()
      val r = spark.table("funnel_subms").filter($"user_id" === 1L)
        .select($"click_id").collect()
      assert(r.length == 1 && r(0).getLong(0) == 21L,
        "the microsecond-earlier click must be the match")
    } finally q.stop()
  }

  test("streaming funnel matches the naive windowed recompute (parity)") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (7L, ts(10), 1L, 0), (7L, ts(20), 2L, 1), (7L, ts(25), 3L, 2),
      (7L, ts(100), 4L, 0), (7L, ts(100), 5L, 1), (7L, ts(161), 6L, 2),
      (7L, ts(300), 7L, 0),
      (8L, ts(50), 8L, 0), (8L, ts(111), 9L, 1), (8L, ts(112), 10L, 2),
      (8L, ts(49), 11L, 1),
      (9L, ts(10), 12L, 0), (9L, ts(10), 13L, 1), (9L, ts(10), 14L, 2))
    val expected = naive(rows)

    val in = MemoryStream[(Long, Timestamp, Long, Int)]
    val out = StreamingFunnel.funnel(in.toDF().toDF(cols: _*), "30 seconds", Win)
    val q = out.writeStream.format("memory").queryName("funnel_parity")
      .outputMode(OutputMode.Append).start()
    try {
      // feed in event-time order across micro-batches (data below the
      // watermark is dropped by the engine — that's the lateness contract,
      // exercised separately above)
      val (early, late) = rows.partition(_._2.getTime < 120000)
      in.addData(early: _*)
      q.processAllAvailable()
      in.addData(late: _*)
      q.processAllAvailable()
      in.addData((99L, ts(100000), 999L, 0))
      q.processAllAvailable()
      val got = spark.table("funnel_parity").filter($"user_id" =!= 99L)
        .select($"view_id", $"click_id", $"purchase_id", $"depth")
        .collect().map(r => r.getLong(0) ->
          ((Option(r.get(1)).map(_.asInstanceOf[Long]),
            Option(r.get(2)).map(_.asInstanceOf[Long]), r.getInt(3)))).toMap
      assert(got === expected, s"stream/naive divergence: $got vs $expected")
      // all three depths occur in the fixture
      assert(got.values.map(_._3).toSet == Set(0, 1, 2))
    } finally q.stop()
  }
}
