package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native vector primitives for the similarity operators (SURVEY.md §7 step 8,
  * VERDICT r1 items 1-2): exact dot product / squared norm / cosine and
  * hyperplane-LSH signatures over `array<float>` embedding columns, as
  * codegen'd Catalyst expressions.
  *
  * Why expressions and not posexplode: the round-1 formulation exploded each
  * 64-dim vector into 64 rows and re-aggregated — a 64× row blowup plus a
  * hash aggregate per dot product. These expressions compute the same values
  * per row inside whole-stage codegen (`doGenCode` emits one static call), so
  * a dot product costs one array traversal and the pair join shuffles only
  * (id, id) candidates — the shape that survives a 100-TB corpus.
  *
  * Why decimal internals: the driver's DuckDB oracle must hash-match
  * bit-for-bit. Double addition is association-order dependent, so all sums
  * accumulate in decimal(scale 10) exactly like `graft.functions.Exact.dsum`:
  * each term is `BigDecimal.valueOf(double)` (Spark's own double→decimal cast
  * path, i.e. the shortest-string representation) rounded HALF_UP to scale
  * 10. The rounded terms are integers in 1e-10 units, so they accumulate in a
  * plain long (exact, order-independent, overflow-free for unit-scale
  * embeddings: |term| ≤ ~1e11, ≤ thousands of terms) and convert back via
  * `BigDecimal.doubleValue` (correctly rounded, matching Spark's
  * Decimal.toDouble and DuckDB's VARCHAR→DOUBLE strtod). Results are
  * bit-identical on any engine, any partitioning, any order — verified
  * differentially against the dsum/posexplode construction in VectorOpsSpec.
  */
object VectorOps {

  private val Scale = 10

  /** One term in 1e-10 units, rounded exactly as Spark's
    * CAST(double AS DECIMAL(28,10)): the shortest-decimal-string value of x,
    * HALF_UP (away from zero) at scale 10. */
  private[functions] def termUnscaledSlow(x: Double): Long =
    JBigDecimal.valueOf(x).setScale(Scale, RoundingMode.HALF_UP)
      .scaleByPowerOfTen(Scale).longValueExact()

  /** Fast path for termUnscaledSlow (~5 ns vs ~340 ns — this is the
    * per-element cost of every dot product, signature, and exact SUM, so it
    * IS the library's hot loop). Two exact shortcuts, falling back to the
    * BigDecimal reference whenever a precondition fails:
    *
    * 1. Short-decimal round-trip: if w = rint(|x|·1e10) divided back by 1e10
    *    reproduces |x|, then w/1e10 is a ≤10-decimal value inside x's
    *    rounding interval, so the shortest representation has ≤ 10 decimals
    *    and scale-10 rounding is the identity — the answer is w. Requires
    *    |x| < 4.5e5 so at most ONE 10-decimal value fits in the interval
    *    (ulp(x)·1e10 < 1), making w unambiguous. Catches money-style data
    *    (2-4 decimal places) at any magnitude in that range.
    * 2. Guarded floor + half-up carry: valid whenever the fractional part of
    *    |x|·1e10 is farther from the .5 rounding boundary than every error
    *    source combined (fp multiply ≤ y·2.2e-16, string-vs-binary
    *    representation ≤ y·2.2e-16, frac quantization ulp(y)) — the guard
    *    band 1e-4 + 4·ulp(y) dominates all three. */
  private[functions] def termUnscaled(x: Double): Long = {
    val ax = math.abs(x)
    if (!(ax < 4.5e5)) return termUnscaledSlow(x)
    val y = ax * 1e10
    val w = Math.rint(y)
    if (w / 1e10 == ax) {
      val r = w.toLong
      return if (x < 0) -r else r
    }
    val lo = y.toLong
    val frac = y - lo
    if (math.abs(frac - 0.5) <= 1e-4 + 4 * Math.ulp(y)) return termUnscaledSlow(x)
    val r = if (frac > 0.5) lo + 1 else lo
    if (x < 0) -r else r
  }

  private def toDouble(unscaled: Long): Double =
    JBigDecimal.valueOf(unscaled, Scale).doubleValue

  /** Non-finite terms are SKIPPED, mirroring the oracle construction exactly:
    * Spark's CAST(NaN/Inf AS DECIMAL) is NULL, the oracle's TRY_CAST
    * (Exact.sqlSum) is NULL, and SUM skips NULLs. Long-domain overflow
    * (|term| ≥ ~9.2e8, astronomically far from embedding magnitudes) reruns
    * the whole sum in exact BigDecimal. */
  private def finite(x: Double): Boolean = x - x == 0.0

  /** Static entry point for DotExact. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    try {
      var acc = 0L
      var i = 0
      while (i < n) {
        if (!a.isNullAt(i) && !b.isNullAt(i)) {
          val p = a.getFloat(i).toDouble * b.getFloat(i).toDouble
          if (finite(p)) acc = Math.addExact(acc, termUnscaled(p))
        }
        i += 1
      }
      toDouble(acc)
    } catch {
      case _: ArithmeticException =>
        var acc = JBigDecimal.ZERO
        var i = 0
        while (i < n) {
          if (!a.isNullAt(i) && !b.isNullAt(i)) {
            val p = a.getFloat(i).toDouble * b.getFloat(i).toDouble
            if (finite(p)) acc =
              acc.add(JBigDecimal.valueOf(p).setScale(Scale, RoundingMode.HALF_UP))
          }
          i += 1
        }
        acc.doubleValue
    }
  }

  /** Static entry point for NormSqExact (sum of squares, pre-sqrt). */
  def normSq(a: ArrayData): Double = {
    val n = a.numElements()
    try {
      var acc = 0L
      var i = 0
      while (i < n) {
        if (!a.isNullAt(i)) {
          val x = a.getFloat(i).toDouble
          val p = x * x
          if (finite(p)) acc = Math.addExact(acc, termUnscaled(p))
        }
        i += 1
      }
      toDouble(acc)
    } catch {
      case _: ArithmeticException =>
        var acc = JBigDecimal.ZERO
        var i = 0
        while (i < n) {
          if (!a.isNullAt(i)) {
            val x = a.getFloat(i).toDouble
            val p = x * x
            if (finite(p)) acc =
              acc.add(JBigDecimal.valueOf(p).setScale(Scale, RoundingMode.HALF_UP))
          }
          i += 1
        }
        acc.doubleValue
    }
  }

  /** Static entry point for CosineExact: dot / (sqrt(na) * sqrt(nb)), each
    * sum decimal-exact — the same double-op order as the SQL oracle. */
  def cosine(a: ArrayData, b: ArrayData): Double =
    dot(a, b) / (math.sqrt(normSq(a)) * math.sqrt(normSq(b)))

  /** Deterministic ±1 Rademacher hyperplanes: plane p's coefficient at
    * 1-based position `pos` is +1 iff the first hex digit of md5("p_pos") is
    * 0-7 — reproducible in any engine with an md5 function (the oracle uses
    * the identical construction in SQL). Rows are cached as plain arrays so
    * the signature inner loop is array indexing, not hashing. */
  private val planeRows = new ConcurrentHashMap[Integer, Array[Double]]()
  private def planeRow(p: Int, dims: Int): Array[Double] = {
    val cached = planeRows.get(p)
    if (cached != null && cached.length >= dims) cached
    else planeRows.synchronized {
      val again = planeRows.get(p)
      if (again != null && again.length >= dims) again
      else {
        val row = new Array[Double](math.max(dims, 64))
        val md = MessageDigest.getInstance("MD5")
        var pos = 1
        while (pos <= row.length) {
          md.reset()
          val d = md.digest(s"${p}_$pos".getBytes(StandardCharsets.UTF_8))
          row(pos - 1) = if (((d(0) >> 4) & 0xf) < 8) 1.0 else -1.0
          pos += 1
        }
        planeRows.put(p, row)
        row
      }
    }
  }

  /** Static entry point for HammingDist: mismatching-byte count of two
    * equal-length signature strings. Signatures are single-byte ASCII
    * ('+'/'-') by construction, so byte mismatches ARE character
    * mismatches; unequal lengths throw, mirroring DuckDB's `hamming()`
    * (the oracle function this must agree with). */
  def hammingBytes(a: UTF8String, b: UTF8String): Int = {
    val len = a.numBytes()
    require(len == b.numBytes(),
      s"hamming_dist requires equal-length strings, got $len vs ${b.numBytes()}")
    // direct byte access — getBytes() would copy both operands per call
    // (sig values read from parquet pages rarely span their whole base
    // array), and this IS the per-pair cost of the compressed-domain scan
    var n = 0
    var i = 0
    while (i < len) {
      if (a.getByte(i) != b.getByte(i)) n += 1
      i += 1
    }
    n
  }

  /** Static entry point for HyperSig: `planes`-char '+'/'-' signature, char p
    * = sign of the exact-decimal projection of the vector on plane p. Fixed
    * width, so LSH bands are plain substrings in Spark AND the SQL oracle. */
  def signature(v: ArrayData, planes: Int): UTF8String = {
    val n = v.numElements()
    val out = new Array[Byte](planes)
    var p = 0
    while (p < planes) {
      val row = planeRow(p, n)
      val nonNeg = try {
        var acc = 0L
        var i = 0
        while (i < n) {
          if (!v.isNullAt(i)) {
            val t = row(i) * v.getFloat(i).toDouble
            if (finite(t)) acc = Math.addExact(acc, termUnscaled(t))
          }
          i += 1
        }
        acc >= 0L
      } catch {
        case _: ArithmeticException =>
          var acc = JBigDecimal.ZERO
          var i = 0
          while (i < n) {
            if (!v.isNullAt(i)) {
              val t = row(i) * v.getFloat(i).toDouble
              if (finite(t)) acc =
                acc.add(JBigDecimal.valueOf(t).setScale(Scale, RoundingMode.HALF_UP))
            }
            i += 1
          }
          acc.signum() >= 0
      }
      out(p) = if (nonNeg) '+' else '-'
      p += 1
    }
    UTF8String.fromBytes(out)
  }

  // ------------------------------------------------------------ Column API --

  def dotExact(a: Column, b: Column): Column =
    bridge.column(DotExact(bridge.expression(a), bridge.expression(b)))

  def normSqExact(a: Column): Column =
    bridge.column(NormSqExact(bridge.expression(a)))

  def cosineExact(a: Column, b: Column): Column =
    bridge.column(CosineExact(bridge.expression(a), bridge.expression(b)))

  def hyperSig(v: Column, planes: Int): Column =
    bridge.column(HyperSig(bridge.expression(v), planes))

  def hammingDist(a: Column, b: Column): Column =
    bridge.column(HammingDist(bridge.expression(a), bridge.expression(b)))

  private[functions] def checkFloatArray(dt: DataType, name: String): TypeCheckResult =
    dt match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"$name requires array<float>, got $other")
    }
}

/** Exact cross-engine-stable dot product of two `array<float>` columns. */
case class DotExact(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    VectorOps.checkFloatArray(left.dataType, prettyName) match {
      case TypeCheckResult.TypeCheckSuccess =>
        VectorOps.checkFloatArray(right.dataType, prettyName)
      case f => f
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.dot($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotExact =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "dot_exact"
}

/** Exact squared L2 norm (pre-sqrt) of an `array<float>` column. */
case class NormSqExact(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    VectorOps.checkFloatArray(child.dataType, prettyName)
  override def nullSafeEval(input: Any): Any =
    VectorOps.normSq(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorOps.normSq($c)")
  override protected def withNewChildInternal(newChild: Expression): NormSqExact =
    copy(child = newChild)
  override def prettyName: String = "norm_sq_exact"
}

/** Exact cross-engine-stable cosine similarity of two `array<float>` columns;
  * see [[VectorOps]] for the determinism contract. */
case class CosineExact(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    VectorOps.checkFloatArray(left.dataType, prettyName) match {
      case TypeCheckResult.TypeCheckSuccess =>
        VectorOps.checkFloatArray(right.dataType, prettyName)
      case f => f
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.cosine($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineExact =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "cosine_exact"
}

/** Byte-wise Hamming distance of two equal-length signature strings —
  * the compressed-domain ranking primitive behind the ANN top-k pool scans
  * (ss2/ss9): one codegen'd array walk per row over the narrow sig column,
  * never a float touched until the rerank pool. Agrees exactly with
  * DuckDB's `hamming()` (both throw on unequal lengths). */
case class HammingDist(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(s"$prettyName requires two strings, got ($l, $r)")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.hammingBytes(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.hammingBytes($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDist =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "hamming_dist"
}

/** Hyperplane-LSH sign signature of an `array<float>` column: a fixed-width
  * '+'/'-' string, one char per plane; see [[VectorOps]]. */
case class HyperSig(child: Expression, planes: Int) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (planes < 1 || planes > 4096)
      TypeCheckResult.TypeCheckFailure(s"hyper_sig planes must be in [1, 4096], got $planes")
    else VectorOps.checkFloatArray(child.dataType, prettyName)
  override def nullSafeEval(input: Any): Any =
    VectorOps.signature(input.asInstanceOf[ArrayData], planes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorOps.signature($c, $planes)")
  override protected def withNewChildInternal(newChild: Expression): HyperSig =
    copy(child = newChild)
  override def prettyName: String = "hyper_sig"
}
