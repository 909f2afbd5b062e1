package graft.operators

import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window => LWindow}

import graft.{SparkEntry, SparkSpec}

/** SURVEY §2.G's "zero unpartitioned windows" invariant, frozen as a test
  * over the WHOLE declared surface.
  *
  * Every single-partition window in the library is provably bounded and
  * declares that boundedness with [[PrefixSum.onePart]]'s non-foldable
  * constant key. A window whose partition spec ends up EMPTY in the
  * optimized plan is either a corpus-sized sort on one task (the retired
  * anti-pattern) or a bounded pass that lost its declaration to Spark 4's
  * `EliminateWindowPartitions` (a17's round-12 regression: a foldable
  * `lit()` metric tag was stripped, and `WindowExec` warned `No Partition
  * Defined` on every Verify run). Both are failures here.
  *
  * Asserted on the OPTIMIZED logical plan: EliminateWindowPartitions is an
  * optimizer rule, so this is exactly the spec WindowExec will execute
  * with, without paying physical planning for 175 queries. */
class WindowPartitionInvariantSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("no query plans a Window with an empty partition spec") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        val plan: LogicalPlan = q(spark, dir).queryExecution.optimizedPlan
        plan.collect {
          case w: LWindow if w.partitionSpec.isEmpty =>
            s"$name: ${w.windowExpressions.map(_.sql).mkString(", ")}"
        }
    }
    assert(offenders.isEmpty,
      s"unpartitioned Window(s) in optimized plans:\n${offenders.mkString("\n")}")
  }
}
