#!/usr/bin/env python3
"""Per-query bench regression gate (NOT shipped library code).

Usage: python3 tools/bench_gate.py [candidate_detail.json] [pinned_detail.json]

Compares a BENCH_detail-shaped JSON (default: target/bench_detail.json)
against the pinned baseline (default: BENCH_detail_r13.json, per
BASELINE.md "Pinned absolute bench baseline"). A pinned query FLAGS when
its median exceeds 2.0x the pin AND the absolute delta exceeds 0.2 s —
the ratio is the regression signal, the floor keeps sub-100 ms queries
from flagging on scheduler noise. New queries (no pin) are listed, never
flagged. Exits 1 on any flag.
"""
import json
import sys

RATIO = 2.0
FLOOR_SEC = 0.2


def main():
    cand_path = sys.argv[1] if len(sys.argv) > 1 else "target/bench_detail.json"
    pin_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_detail_r13.json"
    cand = json.load(open(cand_path))
    pin = json.load(open(pin_path))
    cq = cand["queries"]
    pq = pin["queries"]

    flags, improved, new = [], [], []
    for name in sorted(cq):
        m = cq[name]
        if name not in pq:
            new.append(name)
            continue
        p = pq[name]
        if m > p * RATIO and m - p > FLOOR_SEC:
            flags.append({"query": name, "median": round(m, 3),
                          "pinned": round(p, 3), "ratio": round(m / p, 2)})
        elif p > m * RATIO and p - m > FLOOR_SEC:
            improved.append({"query": name, "median": round(m, 3),
                             "pinned": round(p, 3), "ratio": round(m / p, 2)})
    removed = sorted(set(pq) - set(cq))

    for f in flags:
        print(f"FLAG {f['query']}: {f['median']}s vs pinned {f['pinned']}s "
              f"({f['ratio']}x)")
    for f in improved:
        print(f"BETTER {f['query']}: {f['median']}s vs pinned {f['pinned']}s "
              f"({f['ratio']}x)")
    print(f"== {len(flags)} flagged, {len(improved)} improved, "
          f"{len(new)} new (unpinned), {len(removed)} removed, "
          f"{len(set(cq) & set(pq))} compared ==")
    print(json.dumps({
        "metric": "bench_gate", "flags": flags, "n_flagged": len(flags),
        "n_improved": len(improved), "new": new, "removed": removed,
        "total_cand": round(cand.get("value", 0.0), 1),
        "total_pinned": round(pin.get("value", 0.0), 1),
        "candidate": cand_path, "pinned": pin_path}))
    sys.exit(1 if flags else 0)


if __name__ == "__main__":
    main()
