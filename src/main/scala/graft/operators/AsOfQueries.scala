package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Exact.{dsum, sqlSum}
import graft.sources.Tables

/** Declared queries over the [[AsOf]] operator, on the `events` table:
  *
  *  - a01 (backward): purchase→view attribution — for each `purchase`, the
  *    latest `view` by the same user at-or-before it (null when the user
  *    never viewed before buying).
  *  - a04 (forward): view→purchase conversion — for each `view`, the
  *    earliest `purchase` by the same user at-or-after it plus the
  *    conversion lag in seconds (nulls when the view never converts).
  *
  * The oracles mirror the union+window formulations directly, so the
  * operators' tie semantics (same-timestamp rows match; latest view /
  * earliest purchase wins) are hash-checked, not just row-counted. */
object AsOfQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a01_asof_attribution" -> a01,
    "a04_next_conversion" -> a04,
    "a06_nearest_join" -> a06,
    "a07_funnel" -> a07,
    "a08_time_weighted_avg" -> a08)

  private def a01(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts", $"value")
    val views = ev.filter($"event_type" === "view")
      .select($"user_id", $"ts", $"event_id")
    AsOf.joinBackward(purchases, views, Seq("user_id"), "ts", "event_id",
        Seq("event_id", "ts"))
      .select($"event_id", $"user_id", $"ts", $"value",
        $"asof_event_id".as("view_event_id"), $"asof_ts".as("view_ts"))
      .orderBy($"event_id")
  }

  private def a04(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
    val views = ev.filter($"event_type" === "view")
      .select($"event_id", $"user_id", $"ts")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id")
    AsOf.joinForward(views, purchases, Seq("user_id"), "ts", "event_id",
        Seq("event_id", "ts"))
      .select($"event_id", $"user_id", $"ts",
        $"asof_event_id".as("purchase_event_id"), $"asof_ts".as("purchase_ts"))
      .withColumn("lag_sec",
        unix_timestamp($"purchase_ts") - unix_timestamp($"ts"))
      .orderBy($"event_id")
  }

  /** a06 (nearest): error→click correlation — for each `error`, the same
    * user's click CLOSEST in time, either direction, exact-microsecond
    * distances, backward winning ties ([[AsOf.joinNearest]]). */
  private def a06(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
    val errors = ev.filter($"event_type" === "error")
      .select($"event_id", $"user_id", $"ts")
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"event_id")
    AsOf.joinNearest(errors, clicks, Seq("user_id"), "ts", "event_id",
        Seq("event_id"))
      .select($"event_id", $"user_id", $"ts",
        $"nearest_event_id".as("click_event_id"),
        $"nearest_ts".as("click_ts"),
        $"nearest_dist_us".as("dist_us"), $"nearest_dir".as("dir"))
      .orderBy($"event_id")
  }

  /** a07 (composed): the 3-step funnel view → click → purchase — stage 2
    * is [[AsOf.joinForward]] anchored at stage 1's MATCHED time (earliest
    * click at-or-after the view, then earliest purchase at-or-after that
    * click). Composition is where the single-shuffle window shape pays off
    * twice: each stage is one key shuffle, never a growing pair explosion.
    * Output: every view with its stage matches and funnel depth (0/1/2). */
  private def a07(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
    val views = ev.filter($"event_type" === "view")
      .select($"event_id", $"user_id", $"ts")
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"event_id")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("ts2"), $"event_id")
    val v1 = AsOf.joinForward(views, clicks, Seq("user_id"), "ts", "event_id",
        Seq("event_id", "ts"))
      .select($"event_id", $"user_id", $"ts",
        $"asof_event_id".as("click_event_id"), $"asof_ts".as("click_ts"))
    val reached = v1.filter($"click_ts".isNotNull).withColumn("ts2", $"click_ts")
    val v2 = AsOf.joinForward(reached, purchases, Seq("user_id"), "ts2",
        "event_id", Seq("event_id"))
      .select($"event_id", $"asof_event_id".as("purchase_event_id"))
    v1.join(v2, Seq("event_id"), "left")
      .select($"event_id", $"user_id", $"ts", $"click_event_id",
        $"purchase_event_id",
        when($"click_event_id".isNull, 0)
          .when($"purchase_event_id".isNull, 1).otherwise(2).as("funnel_depth"))
      .orderBy($"event_id")
  }

  /** a08 (interval aggregation): per-user TIME-WEIGHTED average of `value`
    * — the step-function mean every IoT/market/telemetry pipeline computes
    * over irregular samples: each event's value holds until the user's next
    * event, so the mean weights by the holding duration, not the sample
    * count (a plain AVG over-weights bursts). One `lead` window per user
    * (the a02/a04 single-shuffle shape; per-user partitions are bounded by
    * per-user event counts) yields exact integer-microsecond durations;
    * the weighted sum uses the library's decimal-exact double aggregation
    * ([[graft.functions.Exact]]) so the result is association-order
    * independent — identical bits on any cluster size AND on the DuckDB
    * oracle's different accumulation order. The summand is
    * `value · (dur/span)` — weights NORMALIZED per row (two IEEE ops,
    * bit-identical on both engines) rather than `value · dur_µs` summed
    * then divided, because a µs-weighted product (~1e12) carries more
    * decimal digits than a double holds, putting the DECIMAL(28,10)
    * rounding outside the cross-engine-exact regime; the normalized
    * summand is O(value) where Dec10's rounding is proven bit-stable.
    * Users whose events all share one instant have zero span and are
    * excluded (a TWA is undefined there), matching the oracle's HAVING. */
  private def a08(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val steps = Tables.events(s, d)
      .select($"user_id", $"event_id", $"ts", $"value")
      .withColumn("us", unix_micros($"ts"))
      .withColumn("nxt_us", lead($"us", 1).over(w))
      .filter($"nxt_us".isNotNull)
      .withColumn("dur", $"nxt_us" - $"us")
      .withColumn("span_us", sum($"dur").over(Window.partitionBy($"user_id")))
      .filter($"span_us" > 0)
    steps.groupBy($"user_id")
      .agg(
        (count(lit(1)) + 1).as("n_events"),
        max($"span_us").as("span_us"),
        dsum($"value" * ($"dur".cast("double") / $"span_us".cast("double")))
          .as("twa"))
      .select($"user_id", $"n_events", $"span_us", $"twa")
      .orderBy($"user_id")
  }

  def oracleSql: Map[String, String] = Map(
    "a08_time_weighted_avg" ->
      s"""WITH st AS (
         |  SELECT user_id, value, epoch_us(ts) AS us,
         |         lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt_us
         |  FROM events
         |),
         |steps AS (
         |  SELECT user_id, value, nxt_us - us AS dur FROM st WHERE nxt_us IS NOT NULL
         |),
         |spanned AS (
         |  SELECT user_id, value, dur,
         |         SUM(dur) OVER (PARTITION BY user_id) AS span_us
         |  FROM steps
         |)
         |SELECT user_id,
         |       CAST(COUNT(*) + 1 AS BIGINT) AS n_events,
         |       CAST(MAX(span_us) AS BIGINT) AS span_us,
         |       ${sqlSum("value * (CAST(dur AS DOUBLE) / CAST(span_us AS DOUBLE))")} AS twa
         |FROM spanned WHERE span_us > 0 GROUP BY user_id
         |ORDER BY user_id""".stripMargin,
    "a01_asof_attribution" ->
      """WITH u AS (
        |  SELECT user_id, ts, event_id, value,
        |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_left
        |  FROM events WHERE event_type IN ('view', 'purchase')
        |),
        |m AS (
        |  SELECT *,
        |         last_value(CASE WHEN is_left = 0 THEN event_id END IGNORE NULLS)
        |           OVER w AS view_event_id,
        |         last_value(CASE WHEN is_left = 0 THEN ts END IGNORE NULLS)
        |           OVER w AS view_ts
        |  FROM u
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, is_left, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |)
        |SELECT event_id, user_id, ts, value, view_event_id, view_ts
        |FROM m WHERE is_left = 1 ORDER BY event_id""".stripMargin,
    // two chained forward carries: stage 1 the a04 construction, stage 2
    // re-anchored at the matched click time (ts2), identical tie rules
    "a07_funnel" ->
      """WITH u1 AS (
        |  SELECT user_id, ts, event_id,
        |         CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS is_left
        |  FROM events WHERE event_type IN ('view', 'click')
        |),
        |m1 AS (
        |  SELECT *,
        |         last_value(CASE WHEN is_left = 0 THEN event_id END IGNORE NULLS)
        |           OVER w AS click_event_id,
        |         last_value(CASE WHEN is_left = 0 THEN ts END IGNORE NULLS)
        |           OVER w AS click_ts
        |  FROM u1
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts DESC, is_left, event_id DESC
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |),
        |v1 AS (
        |  SELECT event_id, user_id, ts, click_event_id, click_ts
        |  FROM m1 WHERE is_left = 1
        |),
        |u2 AS (
        |  SELECT user_id, click_ts AS ts2, event_id, 1 AS is_left
        |  FROM v1 WHERE click_ts IS NOT NULL
        |  UNION ALL
        |  SELECT user_id, ts AS ts2, event_id, 0 AS is_left
        |  FROM events WHERE event_type = 'purchase'
        |),
        |m2 AS (
        |  SELECT *,
        |         last_value(CASE WHEN is_left = 0 THEN event_id END IGNORE NULLS)
        |           OVER w2 AS purchase_event_id
        |  FROM u2
        |  WINDOW w2 AS (PARTITION BY user_id ORDER BY ts2 DESC, is_left, event_id DESC
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |),
        |v2 AS (SELECT event_id, purchase_event_id FROM m2 WHERE is_left = 1)
        |SELECT v1.event_id, v1.user_id, v1.ts, v1.click_event_id,
        |       v2.purchase_event_id,
        |       CASE WHEN v1.click_event_id IS NULL THEN 0
        |            WHEN v2.purchase_event_id IS NULL THEN 1
        |            ELSE 2 END AS funnel_depth
        |FROM v1 LEFT JOIN v2 USING (event_id)
        |ORDER BY v1.event_id""".stripMargin,
    // both directed window carries over one tagged union, then the exact
    // integer-microsecond comparison picks the closer side (ties backward)
    "a06_nearest_join" ->
      """WITH u AS (
        |  SELECT user_id, ts, event_id,
        |         CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_left
        |  FROM events WHERE event_type IN ('error', 'click')
        |),
        |b AS (
        |  SELECT *,
        |         last_value(CASE WHEN is_left = 0 THEN event_id END IGNORE NULLS)
        |           OVER wb AS bk_id,
        |         last_value(CASE WHEN is_left = 0 THEN ts END IGNORE NULLS)
        |           OVER wb AS bk_ts
        |  FROM u
        |  WINDOW wb AS (PARTITION BY user_id ORDER BY ts, is_left, event_id
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |),
        |f AS (
        |  SELECT *,
        |         last_value(CASE WHEN is_left = 0 THEN event_id END IGNORE NULLS)
        |           OVER wf AS fw_id,
        |         last_value(CASE WHEN is_left = 0 THEN ts END IGNORE NULLS)
        |           OVER wf AS fw_ts
        |  FROM b
        |  WINDOW wf AS (PARTITION BY user_id ORDER BY ts DESC, is_left, event_id DESC
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |),
        |pick AS (
        |  SELECT event_id, user_id, ts, bk_id, bk_ts, fw_id, fw_ts,
        |         (fw_ts IS NULL OR (bk_ts IS NOT NULL
        |            AND epoch_us(ts) - epoch_us(bk_ts) <= epoch_us(fw_ts) - epoch_us(ts)))
        |           AS use_bk
        |  FROM f WHERE is_left = 1
        |)
        |SELECT event_id, user_id, ts,
        |       CASE WHEN use_bk THEN bk_id ELSE fw_id END AS click_event_id,
        |       CASE WHEN use_bk THEN bk_ts ELSE fw_ts END AS click_ts,
        |       CASE WHEN use_bk THEN epoch_us(ts) - epoch_us(bk_ts)
        |            ELSE epoch_us(fw_ts) - epoch_us(ts) END AS dist_us,
        |       CASE WHEN bk_ts IS NULL AND fw_ts IS NULL THEN NULL
        |            WHEN use_bk THEN 'backward' ELSE 'forward' END AS dir
        |FROM pick ORDER BY event_id""".stripMargin,
    // forward mirror: descending time, equal-ts purchases sort before the
    // view row, smallest event_id wins among equal purchase timestamps
    "a04_next_conversion" ->
      """WITH u AS (
        |  SELECT user_id, ts, event_id,
        |         CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS is_left
        |  FROM events WHERE event_type IN ('view', 'purchase')
        |),
        |m AS (
        |  SELECT *,
        |         last_value(CASE WHEN is_left = 0 THEN event_id END IGNORE NULLS)
        |           OVER w AS purchase_event_id,
        |         last_value(CASE WHEN is_left = 0 THEN ts END IGNORE NULLS)
        |           OVER w AS purchase_ts
        |  FROM u
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts DESC, is_left, event_id DESC
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |)
        |SELECT event_id, user_id, ts, purchase_event_id, purchase_ts,
        |       date_diff('second', ts, purchase_ts) AS lag_sec
        |FROM m WHERE is_left = 1 ORDER BY event_id""".stripMargin)
}
