package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Differential + invariant tests for the temporal operators, on real
  * driver data — the engine-side analog of the oracle checks. */
class TemporalOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("as-of join == naive range-join + argmax (differential)") {
    import spark.implicits._
    val ev = graft.sources.Tables.events(spark, dir)
    val p = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val v = ev.filter($"event_type" === "view")
      .select($"user_id".as("v_user"), $"ts".as("v_ts"), $"event_id".as("v_id"))
    // the formulation AsOf exists to avoid: expand all (purchase, earlier
    // view) pairs, keep the argmax — O(|P|·|V|) per user, fine at sf0.001
    val naive = p.join(v, $"user_id" === $"v_user" && $"v_ts" <= $"ts", "left")
      .withColumn("rn", row_number().over(
        Window.partitionBy($"event_id").orderBy(desc("v_ts"), desc("v_id"))))
      .filter($"rn" === 1)
      .select($"event_id", $"v_id")
    val fast = AsOfQueries.queries("a01_asof_attribution")(spark, dir)
      .select($"event_id", $"view_event_id")
    val n = naive.collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val f = fast.collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(f === n, "window formulation must equal the naive range-join argmax")
    assert(f.nonEmpty && f.values.exists(_.isDefined) && f.values.exists(_.isEmpty),
      "fixture should exercise both matched and unmatched purchases")
  }

  test("forward as-of == naive range-join + argmin (differential)") {
    import spark.implicits._
    val ev = graft.sources.Tables.events(spark, dir)
    val v = ev.filter($"event_type" === "view")
      .select($"event_id", $"user_id", $"ts")
    val p = ev.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"ts".as("p_ts"), $"event_id".as("p_id"))
    val naive = v.join(p, $"user_id" === $"p_user" && $"p_ts" >= $"ts", "left")
      .withColumn("rn", row_number().over(
        Window.partitionBy($"event_id").orderBy(asc("p_ts"), asc("p_id"))))
      .filter($"rn" === 1)
      .select($"event_id", $"p_id")
    val fast = AsOfQueries.queries("a04_next_conversion")(spark, dir)
      .select($"event_id", $"purchase_event_id")
    val n = naive.collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val f = fast.collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(f === n, "forward window formulation must equal the naive argmin")
    assert(f.nonEmpty && f.values.exists(_.isDefined) && f.values.exists(_.isEmpty),
      "fixture should exercise both converting and non-converting views")
  }

  test("funnel == naive per-view double argmin (differential)") {
    import spark.implicits._
    val ev = graft.sources.Tables.events(spark, dir).collect()
    // exact microseconds, not Timestamp.getTime millis — sub-ms ties matter
    def us(t: java.sql.Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    def of(t: String) = ev.filter(_.getString(3) == t)
      .map(r => (r.getLong(0), r.getLong(2), us(r.getTimestamp(1)))) // id, user, us
      .sortBy(x => (x._3, x._1))
    val views = of("view"); val clicks = of("click"); val purchases = of("purchase")
    val naive = views.map { case (vid, u, vts) =>
      // earliest click >= view ts (ties -> smallest id), then earliest
      // purchase >= that click's ts
      val c = clicks.filter(c => c._2 == u && c._3 >= vts).headOption
      val p = c.flatMap(c0 =>
        purchases.filter(p => p._2 == u && p._3 >= c0._3).headOption)
      vid -> (c.map(_._1), p.map(_._1))
    }.toMap
    val fast = AsOfQueries.queries("a07_funnel")(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((Option(r.get(3)), Option(r.get(4))), r.getInt(5))).toMap
    assert(fast.keySet == naive.keySet)
    fast.foreach { case (vid, ((c, p), depth)) =>
      assert((c, p) == naive(vid), s"funnel mismatch for view $vid")
      assert(depth == Seq(c, p).count(_.isDefined), s"depth mismatch for $vid")
    }
    // the fixture must exercise all three depths
    assert(fast.values.map(_._2).toSet == Set(0, 1, 2))
  }

  test("nearest join == naive |Δt| argmin with backward tie preference") {
    import spark.implicits._
    val ev = graft.sources.Tables.events(spark, dir)
    val e = ev.filter($"event_type" === "error")
      .select($"event_id", $"user_id", $"ts")
    val c = ev.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"ts".as("c_ts"), $"event_id".as("c_id"))
    // naive: all same-user pairs, order by (|Δ|, prefer backward, the
    // directional tie rules), keep the first
    val dist = abs(unix_micros($"c_ts") - unix_micros($"ts"))
    val isFwd = (unix_micros($"c_ts") > unix_micros($"ts")).cast("int")
    val naive = e.join(c, $"user_id" === $"c_user", "left")
      .withColumn("rn", row_number().over(
        Window.partitionBy($"event_id").orderBy(
          dist.asc, isFwd.asc,
          // backward keeps the GREATEST id among equal ts, forward the
          // SMALLEST — mirror of the directed operators' tie rules
          when(isFwd === 0, -$"c_id").otherwise($"c_id").asc)))
      .filter($"rn" === 1)
      .select($"event_id", $"c_id")
    val fast = AsOfQueries.queries("a06_nearest_join")(spark, dir)
      .select($"event_id", $"click_event_id", $"dir", $"dist_us")
    val n = naive.collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val f = fast.collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(f === n, "window formulation must equal the naive |Δt| argmin")
    // distances are non-negative; both directions occur on the fixture
    val rows = fast.collect()
    assert(rows.forall(r => r.isNullAt(3) || r.getLong(3) >= 0))
    val dirs = rows.map(_.getString(2)).filter(_ != null).toSet
    assert(dirs == Set("backward", "forward"),
      s"fixture should exercise both directions, got $dirs")
  }

  test("sessionization invariants: partition, ordering, gap separation") {
    import spark.implicits._
    val gap = 1800L
    val sess = SessionQueries.queries("a02_sessionize")(spark, dir).collect()
    val byUser = sess.groupBy(_.getLong(0))
    // session ids are 1..k consecutive per user
    byUser.foreach { case (u, rows) =>
      val ids = rows.map(_.getLong(1)).sorted
      assert(ids.toSeq == (1L to ids.length).toSeq, s"user $u ids: ${ids.toSeq}")
      val ordered = rows.sortBy(_.getLong(1))
      ordered.foreach { r =>
        assert(!r.getTimestamp(4).before(r.getTimestamp(3)), "ts_end >= ts_start")
        // dur_sec is a floor-second difference (unix_timestamp /
        // date_diff('second') semantics), not a millisecond delta
        assert(r.getLong(5) ==
          Math.floorDiv(r.getTimestamp(4).getTime, 1000L) -
            Math.floorDiv(r.getTimestamp(3).getTime, 1000L))
      }
      // consecutive sessions separated by MORE than the gap
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          val sep = Math.floorDiv(b.getTimestamp(3).getTime, 1000L) -
            Math.floorDiv(a.getTimestamp(4).getTime, 1000L)
          assert(sep > gap, s"user $u sessions ${a.getLong(1)}/${b.getLong(1)} separated by $sep s")
        case _ =>
      }
    }
    // every event lands in exactly one session
    val nEvents = graft.sources.Tables.events(spark, dir).count()
    assert(sess.map(_.getLong(2)).sum == nEvents, "n_events must partition the stream")
  }

  test("a05 bucketed overlap join == naive theta-join (differential)") {
    import spark.implicits._
    val sess = SessionQueries.queries("a02_sessionize")(spark, dir)
      .select($"user_id", $"session_id", $"ts_start", $"ts_end")
    // the formulation a05 exists to avoid: an unkeyed theta-join (at scale
    // this plans as BroadcastNestedLoopJoin — quadratic, fine at sf0.001)
    val l = sess.select($"user_id".as("u1"), $"session_id".as("s1"),
      $"ts_start".as("a1"), $"ts_end".as("e1"))
    val r = sess.select($"user_id".as("u2"), $"session_id".as("s2"),
      $"ts_start".as("a2"), $"ts_end".as("e2"))
    val naive = l.join(r,
      $"u1" =!= $"u2" && $"a1" <= $"e2" && $"a2" <= $"e1")
      .groupBy($"u1", $"s1")
      .agg(count(lit(1)).as("n_overlap"),
        max(unix_timestamp(least($"e1", $"e2")) -
          unix_timestamp(greatest($"a1", $"a2"))).as("max_overlap_sec"))
    val fast = SessionQueries.queries("a05_overlap_join")(spark, dir)
    val n = naive.collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> (x.getLong(2), x.getLong(3))).toMap
    val f = fast.collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> (x.getLong(2), x.getLong(3))).toMap
    assert(f === n, "bucketed candidates + exact verify must equal the theta-join")
    assert(f.nonEmpty)
    // overlap is symmetric: if (u1,s1) counts (u2,s2), the reverse holds,
    // so every overlap_sec value appears at least twice across the output
    assert(f.values.map(_._2).forall(_ >= 0), "closed-interval overlap is non-negative")
  }

  test("c13 gap stats: telescoping mean, max bound, singleton nulls") {
    import spark.implicits._
    val rows = ParityQueries.queries("c13_contact_gaps")(spark, dir).collect()
    assert(rows.nonEmpty)
    val frames = graft.build.GraphCache(spark, dir).frameActors
      .select($"actor_id", $"frame_id").collect()
      .groupBy(_.getLong(0)).map { case (a, rs) => a -> rs.map(_.getLong(1)).sorted }
    rows.foreach { r =>
      val fs = frames(r.getLong(0))
      assert(r.getLong(1) == fs.length)
      if (fs.length == 1) {
        assert(r.isNullAt(2) && r.isNullAt(3), "singleton actor must report null gaps")
      } else {
        val gaps = fs.sliding(2).map { case Array(x, y) => y - x }.toSeq
        // telescoping: mean = (last - first) / (n - 1), exactly
        assert(r.getDouble(3) == (fs.last - fs.head).toDouble / (fs.length - 1))
        assert(r.getLong(2) == gaps.max)
      }
    }
  }

  test("a03 self-presence invariant + range-dedup == naive per-session count") {
    import spark.implicits._
    val g = graft.build.GraphCache(spark, dir)
    val t0 = g.probes.t0
    val delta = g.delta
    val sess = SessionQueries.queries("a02_sessionize")(spark, dir)
      .withColumn("f0", expr(s"(unix_timestamp(ts_start) - $t0) div $delta"))
      .withColumn("f1", expr(s"(unix_timestamp(ts_end) - $t0) div $delta"))
      .select($"user_id", $"session_id", $"f0", $"f1")
    val fa = g.frameActors.select($"frame_id", $"actor_id")
    // invariant a03's constant self-correction rests on: the session's own
    // user is active in some frame of its own range, for EVERY session
    val sf = sess.select($"user_id", $"session_id",
      explode(sequence($"f0", $"f1")).as("frame_id"))
    val withSelf = sf
      .join(fa, sf("frame_id") === fa("frame_id") && sf("user_id") === fa("actor_id"))
      .select($"user_id", $"session_id").distinct().count()
    assert(withSelf == sess.count(),
      "every session's user must be frame-active inside its own range")
    // differential: the deduped-range decomposition equals the naive
    // explode-join-countDistinct formulation
    val naive = sf
      .join(fa, "frame_id")
      .filter($"actor_id" =!= $"user_id")
      .groupBy($"user_id", $"session_id")
      .agg(countDistinct($"actor_id").as("n_copresent"))
    val fast = SessionQueries.queries("a03_session_copresence")(spark, dir)
    val n = naive.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val f = fast.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(f === n, "range-dedup decomposition must equal the naive count")
    assert(f.nonEmpty)
  }

  test("a08 TWA == naive driver-side step-function recompute; constant user is exact") {
    import spark.implicits._
    val got = AsOfQueries.queries("a08_time_weighted_avg")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got.nonEmpty)

    // naive recompute straight from the definition (collected, per user)
    val ev = graft.sources.Tables.events(spark, dir)
      .select($"user_id", $"event_id", unix_micros($"ts").as("us"), $"value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byUser = ev.groupBy(_._1)
    byUser.foreach { case (u, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      val steps = sorted.zip(sorted.tail).map { case (a, b) => (a._4, b._3 - a._3) }
      val span = steps.map(_._2).sum
      if (span > 0) {
        val (n, s, twa) = got(u)
        assert(n == rows.length.toLong, s"user $u n_events")
        assert(s == span, s"user $u span")
        val expected = steps.map { case (v, dur) => v * (dur.toDouble / span.toDouble) }.sum
        assert(math.abs(twa - expected) < 1e-9, s"user $u twa $twa vs $expected")
      } else assert(!got.contains(u), s"zero-span user $u must be excluded")
    }

    // a constant-valued step function's TWA is that constant, exactly —
    // weights sum to 1 only up to rounding, so check through the operator
    val const = Seq((1L, 10L, 1000000L, 7.5), (1L, 11L, 3000000L, 7.5),
      (1L, 12L, 9000000L, 7.5))
      .toDF("user_id", "event_id", "us", "value")
      .select($"user_id", $"event_id",
        timestamp_micros($"us").as("ts"), $"value")
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val steps2 = const
      .withColumn("nxt", lead(unix_micros($"ts"), 1).over(w))
      .filter($"nxt".isNotNull)
      .withColumn("dur", $"nxt" - unix_micros($"ts"))
      .withColumn("span", sum($"dur").over(Window.partitionBy($"user_id")))
    val twaConst = steps2.groupBy($"user_id")
      .agg(graft.functions.Exact.dsum(
        $"value" * ($"dur".cast("double") / $"span".cast("double"))).as("twa"))
      .collect()(0).getDouble(1)
    assert(twaConst == 7.5)
  }
}
