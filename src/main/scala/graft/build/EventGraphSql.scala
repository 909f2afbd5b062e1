package graft.build

/** DuckDB-runnable mirror of the EventGraph derivation, prepended to every
  * parity query's oracle SQL. Must stay semantically identical to EventGraph:
  * same Δ, same floor-to-second epoch handling, same canonicalization, same
  * probe tie-breaks. */
object EventGraphSql {
  val delta: Long = EventGraph.DeltaSeconds

  /** WITH-clause body defining b/ev/frames/actors/fa/pres/fi/inter + probes.
    * Compose a full query as s"WITH $prelude SELECT ...". */
  val prelude: String =
    s"""b AS (
       |  SELECT CAST(floor(epoch(min(ts))) AS BIGINT) AS t0,
       |         CAST(floor(epoch(max(ts))) AS BIGINT) AS t1
       |  FROM events
       |),
       |ev AS (
       |  SELECT e.event_id, e.user_id, e.event_type, e.value,
       |         (CAST(floor(epoch(e.ts)) AS BIGINT) - b.t0) // $delta AS frame_id
       |  FROM events e, b
       |),
       |fr0 AS (
       |  SELECT unnest(generate_series(0, (t1 - t0) // $delta)) AS frame_id, t0 FROM b
       |),
       |frames AS (
       |  SELECT frame_id,
       |         make_timestamp((t0 + frame_id * $delta) * 1000000) AS ts_start,
       |         make_timestamp((t0 + (frame_id + 1) * $delta) * 1000000) AS ts_end,
       |         CAST($delta AS BIGINT) AS length,
       |         CAST(year(make_timestamp((t0 + frame_id * $delta) * 1000000)) AS BIGINT) AS year,
       |         CAST(month(make_timestamp((t0 + frame_id * $delta) * 1000000)) AS BIGINT) AS month,
       |         CAST(day(make_timestamp((t0 + frame_id * $delta) * 1000000)) AS BIGINT) AS day,
       |         CAST(hour(make_timestamp((t0 + frame_id * $delta) * 1000000)) AS BIGINT) AS hour,
       |         CAST(minute(make_timestamp((t0 + frame_id * $delta) * 1000000)) AS BIGINT) AS minute,
       |         CAST(second(make_timestamp((t0 + frame_id * $delta) * 1000000)) AS BIGINT) AS second
       |  FROM fr0
       |),
       |actors AS (
       |  SELECT DISTINCT user_id AS actor_id,
       |         'ACTOR_' || lpad(CAST(user_id AS VARCHAR), 4, '0') AS name
       |  FROM events
       |),
       |fa AS (SELECT DISTINCT frame_id, user_id AS actor_id FROM ev),
       |pres AS (SELECT DISTINCT frame_id, event_type, user_id FROM ev),
       |fi AS (
       |  SELECT p1.frame_id, p1.user_id AS actor1, p2.user_id AS actor2,
       |         COUNT(*) AS weight
       |  FROM pres p1
       |  JOIN pres p2 ON p1.frame_id = p2.frame_id
       |              AND p1.event_type = p2.event_type
       |              AND p1.user_id < p2.user_id
       |  GROUP BY 1, 2, 3
       |),
       |inter AS (SELECT DISTINCT actor1, actor2 FROM fi),
       |probe_frame AS (
       |  SELECT frame_id AS pf FROM fa GROUP BY frame_id
       |  ORDER BY count(*) DESC, frame_id LIMIT 1
       |),
       |probe_a1 AS (
       |  SELECT user_id AS pa1 FROM ev GROUP BY user_id
       |  ORDER BY count(*) DESC, user_id LIMIT 1
       |),
       |probe_a2 AS (
       |  SELECT user_id AS pa2 FROM ev GROUP BY user_id
       |  ORDER BY count(*) DESC, user_id LIMIT 1 OFFSET 1
       |),
       |probe_day AS (
       |  SELECT day AS pd FROM fi JOIN frames USING (frame_id)
       |  GROUP BY day ORDER BY count(*) DESC, day LIMIT 1
       |),
       |probe_day_hour AS (
       |  SELECT day AS pd, hour AS ph FROM fi JOIN frames USING (frame_id)
       |  GROUP BY day, hour ORDER BY count(*) DESC, day, hour LIMIT 1
       |),
       |probe_date AS (
       |  SELECT year AS py, month AS pm, day AS pdd
       |  FROM fi JOIN frames USING (frame_id)
       |  GROUP BY year, month, day ORDER BY count(*) DESC, year, month, day LIMIT 1
       |)""".stripMargin

  def query(select: String): String = s"WITH $prelude\n$select"
}
