package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a token array, as a native Catalyst expression.
  *
  * Charikar-style similarity hash: each token contributes its 64-bit md5
  * prefix; per bit position the signs are summed and the result bit is the
  * sign of the sum. Near-duplicate documents land at small Hamming distance,
  * so dedup becomes a cheap bit_count(a ^ b) comparison — no shingle joins.
  *
  * Implemented as an `Expression` (not a Scala UDF) so it stays inside
  * whole-stage codegen: `doGenCode` emits a single static call into
  * `SimHash.compute`, keeping the surrounding filter/project pipeline fused
  * (SURVEY.md §2.G "custom vs built-in" preference order).
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 requires array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    SimHash.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object SimHash {
  // one digest instance per thread, reset per token — MessageDigest
  // construction is provider lookup + allocation, far costlier than the
  // 16-byte digest itself
  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val md = digests.get()
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = hash64(md, tokens.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** First 8 bytes of md5(token), big-endian — deterministic across JVMs. */
  private def hash64(md: MessageDigest, s: UTF8String): Long = {
    md.reset()
    val d = md.digest(s.getBytes)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h
  }

  /** Column API: simhash64 over an array<string> column. */
  def simhash64(tokens: Column): Column =
    bridge.column(SimHash64(bridge.expression(tokens)))
}
