package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Ordered-array search primitives. The temporal adjacency index stores each
  * neighbor pair's active frames as a SORTED long array
  * (`ReachabilityQueries.adjacency`); the reachability hot loop needs "first
  * active frame >= arrival" per matched pair. The composable formulation
  * `array_min(filter(fs, _ >= f))` allocates a filtered copy of the array
  * and rescans it per row — per-relaxation-round cost on millions of pairs.
  * [[SortedFirstGeq]] is the same value as a branchless binary search over
  * the unsafe array data, zero allocation, inside whole-stage codegen. */
object ArraySearch {

  /** First element >= x of an ascending-sorted long array, or null when every
    * element is smaller. Null array elements are not expected (the index
    * builder can't produce them) — treated as smallest via getLong=0 would be
    * wrong, so the builder contract is enforced upstream by construction. */
  def firstGeq(arr: ArrayData, x: Long): java.lang.Long = {
    var lo = 0
    var hi = arr.numElements()
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (arr.getLong(mid) >= x) hi = mid else lo = mid + 1
    }
    if (lo < arr.numElements()) java.lang.Long.valueOf(arr.getLong(lo)) else null
  }

  /** Column wrapper: first element of sorted `arr` that is >= `x`. */
  def sortedFirstGeq(arr: Column, x: Column): Column =
    bridge.column(SortedFirstGeq(bridge.expression(arr), bridge.expression(x)))
}

/** `sorted_first_geq(array<long>, long)` — binary search for the first
  * element >= the probe in an ascending-sorted array; null when absent. */
case class SortedFirstGeq(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  // containsNull is accepted either way: Spark's parquet reader reports
  // array elements as nullable even for files written with non-null
  // elements, so a strict containsNull=false check would reject the at-rest
  // index scan itself. The no-null-elements precondition is the INDEX
  // BUILDER's contract (collect_set cannot emit nulls) — documented on
  // [[ArraySearch.firstGeq]].
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"sorted_first_geq requires (array<bigint>, bigint), got ($l, $r)")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    ArraySearch.firstGeq(a.asInstanceOf[ArrayData], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Long ${ev.value}_r = graft.functions.ArraySearch.firstGeq($a, $b);
      if (${ev.value}_r == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = ${ev.value}_r.longValue();
      }
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedFirstGeq =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_first_geq"
}
