package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
    "a04_next_conversion" -> a04)

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

  def oracleSql: Map[String, String] = Map(
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
