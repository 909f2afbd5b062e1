package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint

import graft.SparkSpec

/** The per-vertex state tables the graph metrics join against the day-edge
  * list (k-core members, component labels, ranks, degrees) are sized by the
  * probe-day vertex count — data-dependent, so each broadcast sits behind
  * the a03-style guard ([[GraphMetricsQueries.StateBroadcastMaxKey]]):
  * broadcast under the ceiling, keyed shuffle join above it. This suite
  * pins the OVER-threshold path for every query in the family: identical
  * rows to the broadcast mode, no broadcast hint anywhere in the plan, and
  * no nested-loop/cartesian degradation in either mode. */
class GraphBroadcastGuardSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private val guardedQueries =
    Seq("g02_kcore", "g03_components", "g04_pagerank",
      "g05_link_prediction", "g07_assortativity")

  private def run(name: String): DataFrame =
    GraphMetricsQueries.queries(name)(spark, dir)

  private def assertEquiJoinsOnly(df: DataFrame, name: String): Unit = {
    val p = df.queryExecution.sparkPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"$name must stay an equi-join in every mode:\n${p.take(1500)}")
  }

  for (name <- guardedQueries)
    test(s"$name over the vertex ceiling degrades to a keyed shuffle join, result-identical") {
      val base = run(name).collect().toSeq
      spark.conf.set(GraphMetricsQueries.StateBroadcastMaxKey, "0")
      try {
        val df = run(name)
        // the guard must swap the broadcast hint for a shuffle-keyed one —
        // a forced broadcast above the ceiling is the job-failure mode this
        // guard exists to remove
        val broadcastHints = df.queryExecution.analyzed.collect {
          case h: ResolvedHint if h.hints.strategy.exists(
            _.toString.toLowerCase.contains("broadcast")) => h
        }
        assert(broadcastHints.isEmpty,
          s"over-threshold $name must not force a broadcast: $broadcastHints")
        assertEquiJoinsOnly(df, name)
        assert(df.collect().toSeq == base,
          s"$name must return identical rows in both join modes")
      } finally spark.conf.unset(GraphMetricsQueries.StateBroadcastMaxKey)
    }

  for (name <- guardedQueries)
    test(s"$name under the vertex ceiling keeps equi-joins (broadcast mode)") {
      assertEquiJoinsOnly(run(name), name)
    }
}
