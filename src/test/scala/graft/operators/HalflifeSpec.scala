package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** a15 half-life score on planted events: hand-computed dyadic weights,
  * band edges, and the deep-history floor. The hash oracle pins the corpus
  * values; this pins the decay semantics day by day. */
class HalflifeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int) = Timestamp.valueOf(f"2024-03-${day}%02d 12:00:00")

  test("planted users decay by hand-computed powers of two") {
    // reference day = 2024-03-29 (the max event day)
    val ev = Seq(
      (1L, ts(29)), (1L, ts(29)),  // age 0  → band 0 → w 256, twice
      (1L, ts(22)),                // age 7  → band 1 → w 128
      (1L, ts(1)),                 // age 28 → band 4 → w 16
      (2L, ts(29)),                // age 0 → w 256
      (3L, ts(1)))                 // age 28 → band 4 → w 16 only
      .toDF("user_id", "ts")
    val got = SessionQueries.hlScoreOf(ev).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    assert(got(1L) == ((4L, 3L, 0L, 2 * 256L + 128L + 16L, 656.0 / 256.0)))
    assert(got(2L) == ((1L, 1L, 0L, 256L, 1.0)))
    assert(got(3L) == ((1L, 1L, 28L, 16L, 16.0 / 256.0)))
  }

  test("weights floor at one past the cap band, never zero") {
    val ev = Seq(
      (1L, Timestamp.valueOf("2024-06-01 00:00:00")),   // ref day, w 256
      (2L, Timestamp.valueOf("2023-01-01 00:00:00")))   // age 517 → capped w 1
      .toDF("user_id", "ts")
    val got = SessionQueries.hlScoreOf(ev).collect()
      .map(r => r.getLong(0) -> ((r.getLong(4), r.getDouble(5)))).toMap
    assert(got(2L) == ((1L, 1.0 / 256.0)),
      "deep history must keep weight 1/256, not vanish")
  }
}
