package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One group's current cardinality estimate. `kmv_est` has bit-exact parity
  * with the batch `p02_kmv_cardinality` estimator column; `n_hashes` is the
  * SKETCH size (distinct hashes retained, capped at k) — the batch query's
  * `n_hashes` column is the uncapped full distinct-hash count, so only
  * `kmv_est` is comparable across the two. */
final case class KmvEstimate(source: String, n_hashes: Long, kmv_est: Double)

/** Streaming KMV distinct-count sketch — the MERGEABLE-sketch property that
  * makes KMV the right cardinality estimator for pipelines demonstrated as
  * a Structured Streaming custom-state operator: the per-group state is the
  * k smallest distinct hashes (k longs, bounded forever), every micro-batch
  * folds its hashes into the state, and the emitted estimate after the last
  * batch equals the batch `p02` query on the same rows EXACTLY (bit-for-bit
  * — asserted in StreamingSketchSpec). At 100 TB the same fold runs
  * per-shard and the states union: sketch merging is associative and
  * commutative, so stream/batch/backfill all agree.
  */
object StreamingSketch {

  /** Per-group state: sorted ascending distinct hashes, at most k. */
  final case class KmvState(hashes: Array[Long])

  /** `docs` must be a streaming DataFrame with `source` and `text` columns
    * (the documents-table contract). Emits the updated estimate for each
    * group touched by a micro-batch (OutputMode.Update). */
  def kmvBySource(docs: DataFrame, k: Int): Dataset[KmvEstimate] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("source").as[String],
        // the shared sketch definition (graft.functions.Kmv) — parity with
        // batch p02 is BY CONSTRUCTION, not by parallel maintenance
        graft.functions.Kmv.hashCol(col("text")).as[Long])
      .groupByKey(_._1)
      .mapGroupsWithState[KmvState, KmvEstimate](GroupStateTimeout.NoTimeout)(
        fold(k))
  }

  private def fold(k: Int)(source: String, rows: Iterator[(String, Long)],
      state: GroupState[KmvState]): KmvEstimate = {
    val prev = state.getOption.map(_.hashes).getOrElse(Array.empty[Long])
    val merged = merge(prev, rows.map(_._2), k)
    state.update(KmvState(merged))
    KmvEstimate(source, merged.length, estimate(merged, k))
  }

  /** Fold new hashes into the sorted ≤k state: distinct, sorted, keep the k
    * smallest — associative/commutative, so shard merges commute. O(k)
    * working memory REGARDLESS of batch size: once the sketch is full,
    * hashes at or above the current k-th smallest are rejected before
    * insertion, so a backfill micro-batch replaying millions of rows for
    * one group never materializes more than k+1 values. */
  private[streaming] def merge(state: Array[Long], hs: Iterator[Long], k: Int): Array[Long] = {
    val set = scala.collection.mutable.TreeSet.empty[Long]
    set ++= state
    hs.foreach { h =>
      if (set.size < k) set += h
      else if (h < set.last) {
        set += h
        if (set.size > k) set -= set.last
      }
    }
    set.toArray
  }

  /** The batch p02 estimator (shared [[graft.functions.Kmv]] definition):
    * (k−1)/h_k once the sketch is full; exact count (= state size) below k. */
  private[streaming] def estimate(sorted: Array[Long], k: Int): Double =
    if (sorted.length >= k) graft.functions.Kmv.estimate(sorted(k - 1), k)
    else sorted.length.toDouble
}
