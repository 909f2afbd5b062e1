#!/usr/bin/env python3
"""Merge a partial sf1 re-run artifact into CORRECTNESS_sf1.json (driver-style
tooling, not shipped library code).

Usage: python3 tools/merge_sf1.py <rerun.json> <round>

Every non-meta cell in <rerun.json> replaces the same-named cell in
CORRECTNESS_sf1.json and is stamped with an explicit rerun marker
(`rerun_round`), so the merged record is self-describing about which cells
come from which binary/oracle generation (the round-12 verdict's complaint:
a cell that silently predates the fix it claims to verify is worse than a
red cell). The top-level `__sf1_meta__` records the merge history.
"""
import json, sys, time

def main():
    rerun_path, rnd = sys.argv[1], int(sys.argv[2])
    base = json.load(open("CORRECTNESS_sf1.json"))
    rerun = json.load(open(rerun_path))
    meta = base.pop("__sf1_meta__", {})
    meta.setdefault("merges", [])  # r14 wrote the meta without a merge log
    replaced = []
    # a typo'd or stale cell name must not silently ADD a bogus cell
    # (round-13 advice): every rerun cell must replace an existing one
    unknown = sorted(n for n in rerun
                     if not n.startswith("__") and n not in base)
    if unknown:
        sys.exit(f"rerun cells not present in CORRECTNESS_sf1.json "
                 f"(typo or stale name?): {unknown}")
    for name, cell in rerun.items():
        if name.startswith("__"):
            continue
        cell["rerun_round"] = rnd
        base[name] = cell
        replaced.append(name)
    meta["merges"].append({
        "round": rnd,
        "cells": sorted(replaced),
        "source_meta": rerun.get("__meta__"),
    })
    base["__sf1_meta__"] = meta
    with open("CORRECTNESS_sf1.json", "w") as f:
        json.dump(base, f, indent=2, sort_keys=True)
    n_green = sum(1 for k, v in base.items()
                  if not k.startswith("__") and v.get("hash_match") is True)
    n_total = sum(1 for k in base if not k.startswith("__"))
    print(f"merged {len(replaced)} rerun cells (round {rnd}); "
          f"record now {n_green}/{n_total} hash-green")

if __name__ == "__main__":
    main()
