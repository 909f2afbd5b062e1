package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins (backward and forward) — for each left row, the latest right
  * row with `right.ts <= left.ts` (backward) or the earliest with
  * `right.ts >= left.ts` (forward) in the same key group — the canonical
  * temporal operators Spark's built-in joins don't express directly.
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
  *
  * The payload is carried as ONE struct (null only for left rows), so the
  * matched values are atomically from the SAME right row even when some of
  * its payload columns are null — per-column carries would mix fields from
  * different right rows in that case.
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
  /** Internal working columns — `withColumn` would silently OVERWRITE them if
    * an input carried the same names, corrupting results; reject up front. */
  private val Reserved = Set("is_left", "asof_tb", "asof_row")

  /** Backward as-of: latest right row with `right.ts <= left.ts` per key
    * group; among equal right timestamps the GREATEST tieBreak wins. */
  def joinBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
      ts: String, tieBreak: String, payload: Seq[String]): DataFrame =
    joinDirected(left, right, keys, ts, tieBreak, payload, backward = true)

  /** Forward as-of: EARLIEST right row with `right.ts >= left.ts` per key
    * group (a right row at exactly `left.ts` matches); among equal right
    * timestamps the SMALLEST tieBreak wins — the mirror of
    * [[joinBackward]]'s tie rule, fully deterministic with a unique
    * tieBreak. Same single-shuffle window shape, just traversed in
    * descending time order. */
  def joinForward(left: DataFrame, right: DataFrame, keys: Seq[String],
      ts: String, tieBreak: String, payload: Seq[String]): DataFrame =
    joinDirected(left, right, keys, ts, tieBreak, payload, backward = false)

  /** Nearest-in-time join: for each left row, the right row minimizing the
    * ABSOLUTE time distance within the key group — backward match wins
    * exact-distance ties (the sensor-alignment / log-correlation primitive;
    * backward and forward as-of are its two halves). Distances compare in
    * exact integer MICROSECONDS (no float, no second-flooring), so the
    * choice is bit-deterministic and oracle-reproducible. Output:
    * `nearest_<payload>` columns, `nearest_dist_us` (non-negative BIGINT,
    * null when the key group has no right rows at all), and `nearest_dir`
    * ('backward' | 'forward' | null). Cost: the two directed window passes
    * over one union — still a single hash shuffle on the keys (the two
    * sorts share the exchange), never a pair explosion. */
  def joinNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
      ts: String, tieBreak: String, payload: Seq[String]): DataFrame = {
    val pay = if (payload.contains(ts)) payload else payload :+ ts
    // loud up-front rejection for EVERY column this join writes: the
    // nearest_<payload> outputs, the fixed nearest_dist_us / nearest_dir
    // outputs, and the nearest_bk_<c> working columns the two-pass
    // formulation threads through — same Reserved discipline as joinDirected
    val clash = (pay.flatMap(c => Seq(s"nearest_$c", s"nearest_bk_$c")) ++
      Seq("nearest_dist_us", "nearest_dir")).filter(left.columns.contains)
    require(clash.isEmpty,
      s"left frame already contains output/working columns: ${clash.mkString(", ")}")
    val back = joinBackward(left, right, keys, ts, tieBreak, pay)
    val backR = pay.foldLeft(back)((df, c) =>
      df.withColumnRenamed(s"asof_$c", s"nearest_bk_$c"))
    val both = joinForward(backR, right, keys, ts, tieBreak, pay)
    val backD = unix_micros(col(ts)) - unix_micros(col(s"nearest_bk_$ts"))
    val fwdD = unix_micros(col(s"asof_$ts")) - unix_micros(col(ts))
    val useBack = col(s"asof_$ts").isNull ||
      (col(s"nearest_bk_$ts").isNotNull && backD <= fwdD)
    both.select(left.columns.toIndexedSeq.map(col) ++
      pay.map(c =>
        when(useBack, col(s"nearest_bk_$c")).otherwise(col(s"asof_$c"))
          .as(s"nearest_$c")) ++ Seq(
      when(useBack, backD).otherwise(fwdD).as("nearest_dist_us"),
      when(col(s"nearest_bk_$ts").isNull && col(s"asof_$ts").isNull,
        lit(null).cast("string"))
        .when(useBack, lit("backward")).otherwise(lit("forward"))
        .as("nearest_dir")): _*)
  }

  private def joinDirected(left: DataFrame, right: DataFrame, keys: Seq[String],
      ts: String, tieBreak: String, payload: Seq[String],
      backward: Boolean): DataFrame = {
    val clashes = (left.columns ++ right.columns).filter(Reserved)
    require(clashes.isEmpty,
      s"input frames must not contain reserved as-of columns: ${clashes.mkString(", ")}")
    val outClashes = payload.map(c => s"asof_$c").filter(left.columns.contains)
    require(outClashes.isEmpty,
      s"left frame already contains output columns: ${outClashes.mkString(", ")}")
    val l = left.withColumn("is_left", lit(1))
      .withColumn("asof_tb", lit(null).cast(right.schema(tieBreak).dataType))
      .withColumn("asof_row",
        lit(null).cast(org.apache.spark.sql.types.StructType(
          payload.map(c => right.schema(c).copy(name = c, nullable = true)))))
    val r = right.withColumn("is_left", lit(0))
      .withColumn("asof_tb", col(tieBreak))
      // one atomic struct per right row: non-null iff the row exists, even
      // when individual payload fields are null
      .withColumn("asof_row", struct(payload.map(col): _*))
      .select((keys.map(col) :+ col(ts) :+ col("is_left")
        :+ col("asof_tb") :+ col("asof_row")): _*)
    val u = l.unionByName(r, allowMissingColumns = true)
    // backward: ascending time, the carried right is the latest <= left.ts;
    // forward: descending time, the carried right is the earliest >= left.ts
    // (equal-ts rights sort before the left row in both directions)
    val order =
      if (backward) Seq(col(ts).asc, col("is_left").asc, col("asof_tb").asc)
      else Seq(col(ts).desc, col("is_left").asc, col("asof_tb").desc)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("asof_row", last(col("asof_row"), ignoreNulls = true).over(w))
      .filter(col("is_left") === 1)
      .select(left.columns.toIndexedSeq.map(col) ++
        payload.map(c => col(s"asof_row.$c").as(s"asof_$c")): _*)
  }
}
