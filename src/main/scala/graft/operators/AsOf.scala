package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the latest right row with
  * `right.ts <= left.ts` in the same key group — the canonical temporal
  * operator Spark's built-in joins don't express directly.
  *
  * Formulation: tag both sides, union, ONE window pass per key group ordered
  * by (ts, side, tieBreak) carrying the right side's payload forward with
  * `last(_, ignoreNulls)`, then keep the left rows. This is the
  * scale-correct shape for 100 TB: a single hash shuffle on the key columns
  * and a per-partition sort — never the range-join pair explosion
  * (left ⋈ right ON key AND r.ts <= l.ts produces Σ_key |L|·|R| rows before
  * its argmax), and never a broadcast requirement on either side. Skewed
  * keys are split by AQE like any other single-shuffle window.
  *
  * Tie semantics: a right row at exactly `left.ts` matches (right sorts
  * before left at equal ts); among equal right timestamps the greatest
  * `tieBreak` wins. With a unique tieBreak the result is fully deterministic.
  */
object AsOf {

  /** @param left     left (probe) rows
    * @param right    right (quote/state) rows, payload columns included
    * @param keys     equi-join key columns present on both sides
    * @param ts       event-time column name present on both sides
    * @param tieBreak right-side column breaking equal-`ts` ties (unique id)
    * @param payload  right-side columns to carry onto each left row; emitted
    *                 as `asof_<name>` (null when no right row precedes)
    */
  def joinBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
      ts: String, tieBreak: String, payload: Seq[String]): DataFrame = {
    val pay = payload.map(c => s"asof_$c")
    val l = left.withColumn("is_left", lit(1))
      .select((left.columns.toIndexedSeq.map(col) :+ col("is_left")
        :+ lit(null).cast(right.schema(tieBreak).dataType).as("asof_tb")) ++
        payload.map(c => lit(null).cast(right.schema(c).dataType).as(s"asof_$c")): _*)
    val r = right.withColumn("is_left", lit(0))
      .select((keys.map(col) :+ col(ts) :+ col("is_left")
        :+ col(tieBreak).as("asof_tb")) ++
        payload.map(c => col(c).as(s"asof_$c")): _*)
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts).asc, col("is_left").asc, col("asof_tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = pay.foldLeft(u) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("is_left") === 1)
      .select(left.columns.toIndexedSeq.map(col) ++ pay.map(col): _*)
  }
}
