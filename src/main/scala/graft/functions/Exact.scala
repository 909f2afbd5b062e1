package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType, DoubleType}

/** Cross-engine-exact aggregation helpers.
  *
  * Floating-point SUM is association-order dependent, so a Spark plan and the
  * DuckDB oracle can disagree in the last ulps on large groups. The fix used
  * throughout this library: round each per-row double to DECIMAL(28,10) —
  * BY ITS SHORTEST-DECIMAL STRING, the one convention both engines can
  * reproduce exactly (see [[sqlSum]]; rounding the exact binary value
  * instead diverges on terms whose shortest form and binary value straddle
  * a 10⁻¹⁰ boundary) — sum exactly in decimal, and cast the final value
  * back to double. Identical bits on any engine, any partitioning, any
  * order — which also makes results stable across cluster sizes at 100 TB,
  * not just oracle-matched at sf0.01.
  *
  * The double→decimal conversion is the [[Dec10]] native expression rather
  * than a Cast: Spark's Cast goes through Double.toString + BigDecimal
  * parsing (~340 ns/value — the dominant cost of a 600k-row exact
  * aggregate), while Dec10 reuses [[VectorOps.termUnscaled]]'s fast exact
  * rounding (~5 ns typical) and produces the identical Decimal(28,10).
  */
object Exact {

  /** Order-independent double SUM: exact decimal accumulation. */
  def dsum(c: Column): Column = sum(dec10(c)).cast("double")

  /** Order-independent double AVG: exact decimal sum / count in double. */
  def davg(c: Column): Column = (sum(dec10(c)).cast("double") / count(c)).cast("double")

  /** The double value rounded to DECIMAL(28,10), bit-identical to
    * CAST(c AS DECIMAL(28,10)) but via the fast exact path. */
  def dec10(c: Column): Column = bridge.column(Dec10(bridge.expression(c)))

  /** Static entry for [[Dec10]]'s interpreted + generated code. Values whose
    * scale-10 unscaled form exceeds a long take the BigDecimal route (same
    * result, Decimal carries the big value). Cast parity: NaN/±Infinity and
    * DECIMAL(28,10) overflow (|x| ≥ 1e18) return null, exactly like Spark's
    * non-ANSI CAST — so SUM skips them instead of the query failing. */
  def toDec10(x: Double): Decimal = {
    val ax = math.abs(x)
    if (ax < 9.0e8) Decimal.createUnsafe(VectorOps.termUnscaled(x), 28, 10)
    else if (!(ax < 1.0e18)) null // NaN, ±Inf, precision overflow → null
    else Decimal(scala.math.BigDecimal(
      java.math.BigDecimal.valueOf(x).setScale(10, java.math.RoundingMode.HALF_UP)), 28, 10)
  }

  /** Oracle (DuckDB) SQL fragments mirroring the above, for use in oracleSql.
    * BOTH directions route through VARCHAR, because DuckDB's direct casts
    * differ from the JVM's in the last decimal digit on rare inputs:
    *
    *  - DECIMAL→DOUBLE divides the int128 by 10^scale in double arithmetic
    *    (not correctly rounded), while VARCHAR→DOUBLE's strtod is — hence
    *    the outer VARCHAR hop (verified bit-for-bit since round 4).
    *  - DOUBLE→DECIMAL rounds the exact BINARY value, while [[toDec10]]
    *    rounds the SHORTEST-DECIMAL string (`BigDecimal.valueOf` — Spark's
    *    own CAST semantics). The two straddle a 10⁻¹⁰ boundary for ~1 in
    *    10⁶ uniformly-random terms, which a multi-million-term sf1
    *    aggregate hits a few times per run (ss21: 2 of 500 rows at sf1).
    *    So the inner hop must parse the SHORTEST ROUND-TRIP string — and
    *    DuckDB 1.0's own DOUBLE→VARCHAR prints at most 15 significant
    *    digits, which silently drops the 16th/17th digit wherever the
    *    shortest form needs them (measured: 150/2000 full-mantissa terms
    *    at the 1e6 band; the round-12 ADVICE item). [[sqlDec10]] therefore
    *    BUILDS the shortest round-trip repr with a printf cascade: the
    *    first of %.15g/%.16g/%.17g that parses back to the identical
    *    double. VARCHAR→DECIMAL then rounds it half-up, [[toDec10]]'s rule.
    *
    * TRY_CAST on the inner hop reproduces [[toDec10]]'s null rule
    * (NaN/±Inf/|x|≥1e18 → NULL, so SUM skips them); the plain direct cast
    * ERRORS on those in DuckDB.
    *
    * The CASE guard covers the one VARCHAR→DECIMAL defect (DuckDB 1.0.0):
    * a scientific-notation string ENTIRELY below the scale rounds on the
    * mantissa's leading digit instead of the scale-aligned one ('6.69e-12'
    * and even '9.9e-15' → 1E-10; correct is 0). Every |x| < 5e-11 rounds
    * to exactly 0 under half-up-at-1e-10 — stated directly.
    *
    * Proven domain (tools/dec_probe.py vs a [[graft.tools.DecProbe]] dump
    * from the running JVM — 1.22M probes: per-decade full-mantissa bands
    * 1e-15..1e17, half-up-boundary-crafted, scale-10-grid, dyadic exact
    * ties odd·2⁻ʲ, sub-scale guards, NaN/±Inf/±1e18): bit-exact for every
    * per-term |x| < 2⁵³ ≈ 9.0e15, zero mismatches. At |x| ≥ 2⁵³ doubles
    * are integer-valued and Java 17's legacy Double.toString prints
    * NON-MINIMAL digits for most of them (fixed in JDK 19's Ryu rewrite),
    * so there [[toDec10]] itself is JVM-version-defined and no DuckDB
    * formula can track it — every library call site's terms are ≤ ~1e9,
    * six orders of magnitude inside the proven domain. */
  def sqlDec10(expr: String): String = {
    val e = s"($expr)"
    def p(fmt: String) = s"printf('%.${fmt}g', $e)"
    // VARCHAR→DECIMAL(28,10) hits DuckDB 1.0's int128 string parser at
    // ~2.5 µs/value — 33× the int64-backed DECIMAL(18,10) parse, and the
    // difference is the whole oracle wall on multi-million-term sf1 cells
    // (dd13: 105 s → 40+ min). Parse through (18,10) whenever the value
    // fits (|x| < 9e7 keeps the half-up-rounded integer part ≤ 8 digits,
    // so the widened 18-digit decimal can never overflow) and widen with
    // an exact integer cast; the rare big-magnitude terms (price sums)
    // take the int128 parse. Digit semantics are identical — same parser,
    // narrower storage — probe-proven by tools/dec_probe.py alongside the
    // cascade itself (plus a 2M-value randomized straddle check across the
    // 9e7 cut). 12× measured on the 5M-term microbench.
    def parse(s: String) =
      s"CASE WHEN abs($e) < 9.0e7 THEN CAST(TRY_CAST($s AS DECIMAL(18,10)) AS DECIMAL(28,10)) " +
        s"ELSE TRY_CAST($s AS DECIMAL(28,10)) END"
    s"CASE WHEN abs($e) < 5e-11 THEN CAST(0 AS DECIMAL(28,10)) " +
      s"WHEN TRY_CAST(${p("15")} AS DOUBLE) = $e THEN ${parse(p("15"))} " +
      s"WHEN TRY_CAST(${p("16")} AS DOUBLE) = $e THEN ${parse(p("16"))} " +
      s"ELSE ${parse(p("17"))} END"
  }
  def sqlSum(expr: String): String =
    s"CAST(CAST(SUM(${sqlDec10(expr)}) AS VARCHAR) AS DOUBLE)"
  def sqlAvg(expr: String): String =
    s"(${sqlSum(expr)} / COUNT($expr))"
}

/** CAST(double AS DECIMAL(28,10)) semantics via the fast exact rounding —
  * see [[Exact]]. Nullable like the Cast it replaces: NaN/Inf/overflow
  * inputs produce null (codegen re-checks the static call's result). */
case class Dec10(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DecimalType(28, 10)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case DoubleType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"dec10 requires double, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    Exact.toDec10(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.Exact.toDec10($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): Dec10 =
    copy(child = newChild)

  override def prettyName: String = "dec10"
}
