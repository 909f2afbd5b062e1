package graft.tools

import java.io.PrintWriter
import java.util.Random

import graft.functions.Exact

/** Ground-truth dump for the cross-engine decimal-rounding probes
  * (tools/dec_probe.py compares these against the DuckDB side of
  * [[Exact.sqlSum]]'s VARCHAR route).
  *
  * [[Exact.toDec10]]'s convention is `BigDecimal.valueOf(x)` — the RUNNING
  * JVM's `Double.toString` shortest representation — rounded HALF_UP at
  * scale 10. That string convention is exactly what the oracle SQL must
  * reproduce, and it is JVM-version-sensitive (JDK 19 changed
  * `Double.toString` to Ryu shortest-closest), so the probe is dumped from
  * the JVM rather than re-derived in Python.
  *
  * Families, all deterministic (fixed seed):
  *   1. uniform-in-band across 19 decades, 1e-15..1e17, both signs —
  *      full-mantissa doubles (the ADVICE round-12 gap: DuckDB's 15-digit
  *      CAST string loses the 16th/17th digit for |x| >= ~3e4);
  *   2. boundary-crafted: doubles within a few ulps of (k+0.5)·1e-10 —
  *      the half-up decision point at every magnitude;
  *   3. tie-crafted: doubles parsed from strings with exactly 11 fractional
  *      digits ending in '5' — shortest reprs that ARE exact scale-10 ties,
  *      exercising HALF_UP vs the parser's excess-digit rounding;
  *   4. grid-crafted: doubles nearest k·1e-10 — shortest reprs with <= 10
  *      decimals where rounding must be the identity;
  *   5. specials: ±0.0, NaN, ±Inf, ±1e18 overflow edge, sub-scale guards.
  *
  * Output: one `bitsHex,unscaledDecimalOrNULL` line per probe. */
object DecProbe {
  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "/tmp/decprobe/jvm.csv"
    val perFam = if (args.length > 1) args(1).toInt else 20000
    val rnd = new Random(20260816L)
    val bands = Array(1e-15, 1e-12, 5e-11, 1e-10, 1e-8, 1e-5, 1e-2, 1.0,
      1e2, 3e4, 1e5, 1e6, 1e7, 1e8, 1e9, 1e11, 1e13, 1e15, 1e17)
    val xs = Array.newBuilder[Double]
    def sign() = if (rnd.nextBoolean()) 1.0 else -1.0
    for (b <- bands) {
      var i = 0
      while (i < perFam) {
        xs += (0.5 + 0.5 * rnd.nextDouble()) * b * sign() // family 1
        // family 2: a few ulps around the half-up boundary
        val k = math.abs(rnd.nextLong()) % (math.min(b * 1e10, 1e17).toLong + 10)
        val h = (k + 0.5) * 1e-10
        val bits = java.lang.Double.doubleToLongBits(h) + (rnd.nextInt(5) - 2)
        xs += java.lang.Double.longBitsToDouble(bits) * sign()
        // family 4: on the scale-10 grid
        xs += k * 1e-10 * sign()
        i += 1
      }
    }
    // family 6: the 2^53 neighborhood, where doubles go integer-valued and
    // the legacy (pre-Ryu) Double.toString starts printing non-minimal
    // digits — log-uniform across [1e15, 2^53] and [2^53, 1e17]
    val twoP53 = 9007199254740992.0
    var i6 = 0
    while (i6 < perFam) {
      xs += (1e15 + (twoP53 - 1e15) * rnd.nextDouble()) * sign()
      xs += (twoP53 + (1e17 - twoP53) * rnd.nextDouble()) * sign()
      i6 += 1
    }
    // family 7: dyadic values odd·2^-j — exact short decimal expansions
    // ending in 5, the only inputs whose k-digit rounding can be an EXACT
    // tie (where HALF_UP and a round-half-even printer could part ways)
    var i7 = 0
    while (i7 < perFam) {
      val j = 1 + rnd.nextInt(24)
      val m = (math.abs(rnd.nextLong()) % (1L << (40 + rnd.nextInt(13)))) | 1L
      xs += m.toDouble / (1L << j).toDouble * sign()
      i7 += 1
    }
    // family 3: exact-tie shortest reprs at magnitudes up to 1e6
    var i = 0
    while (i < perFam) {
      val intPart = math.abs(rnd.nextLong()) % 1000000L
      val frac10 = math.abs(rnd.nextLong()) % 10000000000L
      val s = f"$intPart%d.$frac10%010d5"
      xs += s.toDouble * sign()
      i += 1
    }
    // family 5
    xs += 0.0
    xs += -0.0
    xs += Double.NaN
    xs += Double.PositiveInfinity
    xs += Double.NegativeInfinity
    xs += 1e18
    xs += -1e18
    xs += math.nextDown(1e18)
    xs += 9.9e-15
    xs += 6.69e-12
    xs += 4.999999999999998e-11
    xs += 5e-11
    xs += math.nextDown(5e-11)
    val w = new PrintWriter(out)
    try {
      for (x <- xs.result()) {
        val d = Exact.toDec10(x)
        val v = if (d == null) "NULL" else d.toJavaBigDecimal.unscaledValue.toString
        w.println(java.lang.Long.toHexString(java.lang.Double.doubleToRawLongBits(x)) + "," + v)
      }
    } finally w.close()
    println(s"[decprobe] wrote ${xs.result().length} probes to $out")
  }
}
