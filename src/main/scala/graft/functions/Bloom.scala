package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.bridge

/** Column wrappers over Spark's native bloom-filter expressions (the
  * machinery behind `spark.sql.optimizer.runtime.bloomFilter` — here driven
  * EXPLICITLY so a library caller can build a runtime filter from any dim
  * subset and apply it to any probe column, not only where the optimizer's
  * injection heuristics reach). Both sides hash through the same
  * [[XxHash64]] (seed 42, Spark's default), so build and probe agree by
  * construction. Codegen'd end to end — the probe is a bit-test per row,
  * never a UDF. */
object Bloom {

  /** Aggregate building a serialized bloom filter over `key`'s xxhash64.
    * `estItems`/`numBits` are fixed plan-time literals: the blob size is
    * `numBits/8` regardless of input rows, which is what makes collecting
    * it a BOUNDED driver action (the same contract as Spark's own
    * runtime-filter subquery result). */
  def bloomAgg(key: Column, estItems: Long, numBits: Long): Column =
    bridge.column(new BloomFilterAggregate(
      new XxHash64(Seq(bridge.expression(key))),
      Literal(estItems), Literal(numBits)).toAggregateExpression())

  /** Membership probe of `key` against a collected bloom blob, folded into
    * the scan as a constant — false positives possible (the caller keeps an
    * exact join downstream), false negatives impossible. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    bridge.column(BloomFilterMightContain(
      Literal(bloom),
      new XxHash64(Seq(bridge.expression(key)))))
}
