#!/usr/bin/env python3
"""Cross-engine probe for Exact.sqlSum's double->DECIMAL(28,10) oracle route.

Usage:
  sbt -batch "runMain graft.tools.DecProbe /tmp/decprobe/jvm.csv 20000"
  python3 tools/dec_probe.py /tmp/decprobe/jvm.csv

Reads the JVM ground-truth dump (bitsHex,unscaledOrNULL — the value
Exact.toDec10 produces on the RUNNING JVM, i.e. Double.toString shortest
repr rounded HALF_UP at scale 10) and evaluates the DuckDB side of the
oracle route on the identical doubles. Reports mismatches; exit 1 on any.

Evaluates BOTH formulas so regressions/improvements are quantified:
  old  — CAST(x AS VARCHAR) inner hop (DuckDB prints <= 15 sig digits; known
         to lose the 16th/17th digit for full-mantissa |x| >= ~3e4);
  new  — shortest round-trip printf cascade (%.15g -> %.16g -> %.17g, first
         that parses back to the same double), the round-13 fix.
"""
import os, sys, struct
import duckdb, pandas as pd
from fractions import Fraction

OLD = ("CASE WHEN abs(x) < 5e-11 THEN CAST(0 AS DECIMAL(28,10)) "
       "ELSE TRY_CAST(CAST(x AS VARCHAR) AS DECIMAL(28,10)) END")


def _parse(s):
    # the shipped int64-width fast path (Exact.sqlDec10): parse through
    # DECIMAL(18,10) when the value fits, widen exactly; int128 otherwise
    return (f"CASE WHEN abs(x) < 9.0e7 "
            f"THEN CAST(TRY_CAST({s} AS DECIMAL(18,10)) AS DECIMAL(28,10)) "
            f"ELSE TRY_CAST({s} AS DECIMAL(28,10)) END")


_P15 = "printf('%.15g', x)"
_P16 = "printf('%.16g', x)"
_P17 = "printf('%.17g', x)"
NEW = ("CASE WHEN abs(x) < 5e-11 THEN CAST(0 AS DECIMAL(28,10)) "
       f"WHEN TRY_CAST({_P15} AS DOUBLE) = x THEN {_parse(_P15)} "
       f"WHEN TRY_CAST({_P16} AS DOUBLE) = x THEN {_parse(_P16)} "
       f"ELSE {_parse(_P17)} END")


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/decprobe/jvm.csv"
    bits, gt = [], []
    for line in open(path):
        h, v = line.strip().split(",")
        bits.append(int(h, 16))
        gt.append(None if v == "NULL" else int(v))
    xs = [struct.unpack("<d", struct.pack("<Q", b))[0] for b in bits]
    df = pd.DataFrame({"x": xs})
    con = duckdb.connect()
    con.register("probe", df)
    # The proven domain is |x| < 2^53 (see Exact.sqlDec10's scaladoc): above
    # it doubles are integer-valued, several decimal strings round-trip, and
    # Java 17's legacy Double.toString picks NON-MINIMAL digits for most —
    # toDec10 is JVM-version-defined there and no DuckDB formula can track
    # it (every library call site's terms are <= ~1e9). The gate therefore
    # enforces zero mismatches BELOW 2^53 and reports the band above as
    # informational.
    two53 = 2.0 ** 53
    for label, formula in (("old", OLD), ("new", NEW)):
        got = con.execute(
            f"SELECT CAST({formula} AS VARCHAR) FROM probe").fetchall()
        mism = hi_mism = 0
        for (s,), want, x in zip(got, gt, xs):
            have = None if s is None else int(Fraction(s) * 10**10)
            if have != want:
                if x == x and abs(x) >= two53:
                    hi_mism += 1
                    continue
                if mism < 8:
                    print(f"  [{label}] MISMATCH x={x!r} duckdb={s} jvm={want}")
                mism += 1
        print(f"[{label}] {len(xs)} probes, {mism} mismatches below 2^53"
              f" ({hi_mism} in the JVM-defined band above)")
        if label == "new" and mism:
            sys.exit(1)
        # The >= 2^53 band is JVM-version-defined, but a probe corpus that
        # EXERCISES it and diverges must not pass silently (round-13
        # advice): a future oracle call site producing such terms would
        # inherit the divergence. Acknowledging the band is explicit.
        if (label == "new" and hi_mism
                and not os.environ.get("GRAFT_DEC_PROBE_ALLOW_HI")):
            print(f"FAIL: {hi_mism} mismatches at |x| >= 2^53 — every library "
                  "call site must keep dec10 terms below 2^53 (documented "
                  "bound ~1e9); set GRAFT_DEC_PROBE_ALLOW_HI=1 to acknowledge "
                  "the JVM-defined band deliberately")
            sys.exit(1)
    print("OK: new formula bit-exact vs JVM over the full probe corpus below 2^53")


if __name__ == "__main__":
    main()
