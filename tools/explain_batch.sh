#!/bin/bash
# Capture `graft.tools.Explain` output (formatted plan + 3-rep walls +
# AQE-final plan) for a list of queries into plans/r14/<q>_<tag>.txt.
# Usage: tools/explain_batch.sh <tag> <query> [query...]
set -u
TAG="$1"; shift
for q in "$@"; do
  echo "== explain $q ($TAG) =="
  SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.tools.Explain $q /root/testdata/sf0.1" \
    > "plans/r14/${q}_${TAG}.raw" 2>&1
  # strip sbt noise: keep from the first plan line onward
  awk '/^== (Physical Plan|Parsed Logical Plan)|^\[explain\]|^== Final/{found=1} found' \
    "plans/r14/${q}_${TAG}.raw" > "plans/r14/${q}_${TAG}.txt"
  grep -F '[explain]' "plans/r14/${q}_${TAG}.txt" | tail -3
  rm -f "plans/r14/${q}_${TAG}.raw"
done
