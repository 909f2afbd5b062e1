package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.build.{EventGraphSql, GraphCache}

/** Temporal (time-respecting) reachability — the dynamic-graph analytic the
  * frame model exists to enable: actor B is reachable from A when a path of
  * interactions exists whose frame ids never decrease (information can only
  * flow forward in time). Output = every reachable actor with its EARLIEST
  * arrival frame.
  *
  * Execution model: iterative frontier relaxation (earliest-arrival BFS) as
  * a driver-side loop of DataFrame joins — the standard distributed shape
  * for fixpoint algorithms (GraphX's Pregel is the same loop internally).
  * Each round: join the arrival state to the undirected frame-edge set with
  * `edge.frame_id >= arrival(src)`, take the min candidate arrival per
  * actor, merge, repeat until no arrival improves. Rounds are bounded by the
  * temporal diameter (tiny for social contact graphs); per-round cost is one
  * shuffle keyed on actor — at 100 TB the edge side stays partitioned and
  * the state side (|actors| rows) broadcasts.
  *
  * The fixpoint (min arrival per actor) is unique regardless of join or
  * iteration order, so the result is deterministic and the DuckDB oracle
  * can compute it a completely different way — a recursive CTE enumerating
  * (actor, arrival-frame) pairs — and still hash-match.
  */
object ReachabilityQueries {

  /** Safety cap on relaxation rounds (temporal diameter bound). */
  private val MaxRounds = 50

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g01_temporal_reach" -> g01)

  private def g01(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val g = GraphCache(s, d)
    val pa1 = g.probes.pa1
    val edges = g.frameInteractions.select($"frame_id", $"actor1", $"actor2")
    val und = edges.select($"actor1".as("src"), $"actor2".as("dst"), $"frame_id")
      .unionAll(edges.select($"actor2".as("src"), $"actor1".as("dst"), $"frame_id"))
      .persist()

    // arrival(start) = -1: the first hop may use any frame
    var state = Seq((pa1, -1L)).toDF("actor_id", "f").persist()
    // convergence signature: arrivals only ever decrease and the reached set
    // only ever grows, so (|state|, Σ arrivals) is strictly monotone until
    // the fixpoint — one tiny aggregate per round instead of a diff join
    def signature(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), sum($"f")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    var sig = signature(state)
    var round = 0
    var changed = true
    while (changed && round < MaxRounds) {
      val cand = state.join(und,
          state("actor_id") === und("src") && und("frame_id") >= state("f"))
        .select($"dst".as("actor_id"), $"frame_id".as("f"))
      val next = state.unionAll(cand)
        .groupBy($"actor_id").agg(min($"f").as("f"))
        .persist()
      val nextSig = signature(next)
      changed = nextSig != sig
      sig = nextSig
      state.unpersist()
      state = next
      round += 1
    }
    // a silently truncated fixpoint would be a plausible-looking WRONG answer
    // (and diverge from the oracle) on any corpus with temporal diameter >
    // MaxRounds — fail loudly instead
    if (changed) throw new IllegalStateException(
      s"temporal reachability did not converge within $MaxRounds rounds " +
        "(corpus temporal diameter exceeds the cap); raise MaxRounds")
    und.unpersist()
    state.filter($"actor_id" =!= pa1)
      .select($"actor_id", $"f".as("first_frame"))
      .orderBy($"actor_id")
  }

  def oracleSql: Map[String, String] = Map(
    // same fixpoint via recursive enumeration of (actor, arrival) pairs —
    // UNION dedup bounds the recursion by |actors| × |frames|
    "g01_temporal_reach" -> EventGraphSql.query(
      """, reach AS (
        |  WITH RECURSIVE r(actor_id, f) AS (
        |    SELECT pa1, CAST(-1 AS BIGINT) FROM probe_a1
        |    UNION
        |    SELECT CASE WHEN fi.actor1 = r.actor_id THEN fi.actor2 ELSE fi.actor1 END,
        |           fi.frame_id
        |    FROM r JOIN fi ON (fi.actor1 = r.actor_id OR fi.actor2 = r.actor_id)
        |                  AND fi.frame_id >= r.f
        |  )
        |  SELECT actor_id, MIN(f) AS first_frame FROM r GROUP BY actor_id
        |)
        |SELECT actor_id, first_frame FROM reach, probe_a1
        |WHERE actor_id <> pa1
        |ORDER BY actor_id""".stripMargin))
}
