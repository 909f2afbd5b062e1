package graft.operators

import org.apache.spark.sql.DataFrame

/** Hard size gate for the DECLARED non-scale control queries — dd2's
  * exhaustive shared-shingle self-join and ss1's brute-force cosine scan.
  * Both exist as correctness/recall baselines for the indexed variants
  * (dd3, ss2–ss8) and must never be pointed at a production corpus: dd2 is
  * quadratic in shingle document frequency, ss1 reads every vector. The
  * gate is one cheap count over the at-rest input; running a bigger control
  * is a deliberate act (`spark.graft.control.maxRows`), never an accident. */
private[operators] object Controls {

  val MaxRowsKey = "spark.graft.control.maxRows"
  val MaxRowsDefault = 10000000L

  /** Returns `df` unchanged when its row count is within the configured
    * guard; throws otherwise. */
  def gate(df: DataFrame, what: String): DataFrame = {
    val max = df.sparkSession.conf.getOption(MaxRowsKey)
      .map(_.toLong).getOrElse(MaxRowsDefault)
    gate(df, what, max)
  }

  private[operators] def gate(df: DataFrame, what: String, max: Long): DataFrame = {
    val n = df.count()
    require(n <= max,
      s"$what is a declared correctness/recall CONTROL, not a scale path: " +
        s"input has $n rows > $MaxRowsKey=$max. Use the indexed variant " +
        "(dd3 / ss2+) or raise the guard deliberately.")
    df
  }
}
