package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine-exact aggregation helpers.
  *
  * Floating-point SUM is association-order dependent, so a Spark plan and the
  * DuckDB oracle can disagree in the last ulps on large groups. The fix used
  * throughout this library: round each per-row double to DECIMAL(28,10)
  * (doubles are binary fractions, so no value is an exact decimal-10 tie —
  * the rounding is unambiguous and engine-independent), sum exactly in
  * decimal, and cast the final value back to double. Identical bits on any
  * engine, any partitioning, any order — which also makes results stable
  * across cluster sizes at 100 TB, not just oracle-matched at sf0.01.
  */
object Exact {
  private val D = DecimalType(28, 10)

  /** Order-independent double SUM: exact decimal accumulation. */
  def dsum(c: Column): Column = sum(c.cast(D)).cast("double")

  /** Order-independent double AVG: exact decimal sum / count in double. */
  def davg(c: Column): Column = (sum(c.cast(D)).cast("double") / count(c)).cast("double")

  /** Oracle (DuckDB) SQL fragments mirroring the above, for use in oracleSql.
    * DuckDB's direct DECIMAL→DOUBLE cast is not correctly rounded (it divides
    * the int128 by 10^scale in double arithmetic), while Spark's (via
    * BigDecimal) is — so the oracle casts through VARCHAR, whose strtod IS
    * correctly rounded. Verified empirically against Spark bit-for-bit. */
  def sqlSum(expr: String): String =
    s"CAST(CAST(SUM(CAST(($expr) AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE)"
  def sqlAvg(expr: String): String =
    s"(${sqlSum(expr)} / COUNT($expr))"
}
