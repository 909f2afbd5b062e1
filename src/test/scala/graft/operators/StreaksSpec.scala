package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** a16 streaks on planted events: hand-built runs, single-day islands,
  * and the current-streak = final-run rule. The hash oracle pins the
  * corpus; this pins the gaps-and-islands semantics. */
class StreaksSpec extends SparkSpec {
  import spark.implicits._

  private def ts(d: String) = Timestamp.valueOf(s"$d 10:00:00")

  test("hand-built runs: lengths, counts, and the final-run rule") {
    val ev = Seq(
      // user 1: runs [1..3], [5], [7..8] → 6 days, 3 streaks, max 3,
      // current 2 (the run ending at the last active day)
      (1L, ts("2024-05-01")), (1L, ts("2024-05-02")), (1L, ts("2024-05-03")),
      (1L, ts("2024-05-05")),
      (1L, ts("2024-05-07")), (1L, ts("2024-05-08")),
      // two events on one day collapse to one active day
      (2L, ts("2024-05-01")), (2L, Timestamp.valueOf("2024-05-01 23:00:00")),
      // user 3: one long run [10..14]
      (3L, ts("2024-05-10")), (3L, ts("2024-05-11")), (3L, ts("2024-05-12")),
      (3L, ts("2024-05-13")), (3L, ts("2024-05-14")))
      .toDF("user_id", "ts")
    val got = SessionQueries.streaksOf(ev).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(1L) == ((6L, 3L, 3L, 2L)))
    assert(got(2L) == ((1L, 1L, 1L, 1L)))
    assert(got(3L) == ((5L, 1L, 5L, 5L)))
  }

  test("driver corpus invariants: streak mass conserves active days") {
    val rows = SessionQueries.queries("a16_streaks")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nd, ns, mx, cur) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(ns >= 1 && mx >= 1 && cur >= 1)
      assert(mx <= nd && cur <= mx, s"bounds violated: $r")
      assert(ns <= nd, "streak count cannot exceed active days")
    }
  }
}
