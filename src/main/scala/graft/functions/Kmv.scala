package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE k-minimum-values sketch definition — hash construction, normalization
  * constant, and estimator — shared by the batch query (`p02`), its DuckDB
  * oracle, and the streaming operator (`StreamingSketch`), whose bit-exact
  * parity guarantee depends on all three never diverging.
  *
  * Hash = first 8 md5 hex digits of the [[Fingerprint]] identity, as a
  * 32-bit value in a long. Estimate = (k−1)/h_k with h_k normalized by 2^32
  * (a power-of-two division — exact in binary on every engine); below k
  * distinct hashes the sketch IS the exact distinct count. */
object Kmv {

  /** 2^32 as a double (the hash-space size). */
  val Norm: Double = 4294967296.0
  /** The same constant as a DuckDB double literal (strtod-parsed). */
  val NormSql: String = "4294967296.0e0"

  /** The 32-bit KMV hash of a document text column. */
  def hashCol(text: Column): Column =
    conv(substring(Fingerprint.fingerprintMd5(text), 1, 8), 16, 10).cast("long")

  /** Estimator given the k-th smallest distinct hash (scala side). */
  def estimate(hk: Long, k: Int): Double = (k - 1).toDouble / (hk.toDouble / Norm)

  /** Estimator as a Column (batch query side). */
  def estimateCol(hk: Column, k: Int): Column =
    lit((k - 1).toDouble) / (hk.cast("double") / lit(Norm))

  /** Estimator as DuckDB SQL (oracle side). */
  def estimateSql(hk: String, k: Int): String =
    s"${(k - 1).toDouble}e0 / (CAST($hk AS DOUBLE) / $NormSql)"

  /** The same 32-bit hash as DuckDB SQL: first 8 md5 hex digits parsed via
    * 1-based hex-digit positions (the tx5/dd4 oracle construction). */
  def hashSql(textExpr: String = "text"): String = {
    val fpMd5 = s"md5(regexp_replace(lower(trim($textExpr)), '\\s+', ' ', 'g'))"
    (1 to 8).map { i =>
      val pow = java.lang.Long.toString(1L << (4 * (8 - i)))
      s"(strpos('0123456789abcdef', substring($fpMd5, $i, 1)) - 1) * $pow"
    }.mkString("(", "\n       + ", ")")
  }
}
