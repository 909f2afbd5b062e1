package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Declared query over the [[AsOf]] operator: purchase→view attribution on
  * the `events` table — for each `purchase` event, the latest `view` by the
  * same user at-or-before it (null when the user never viewed before
  * buying). The oracle mirrors the union+window formulation directly, so the
  * operator's tie semantics (same-timestamp view matches; latest view wins)
  * are hash-checked, not just row-counted. */
object AsOfQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a01_asof_attribution" -> a01)

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
        |FROM m WHERE is_left = 1 ORDER BY event_id""".stripMargin)
}
