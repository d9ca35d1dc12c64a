#!/bin/bash
# Same-window A/B of the extraction stage (round-5 allocation work):
# interleaves KG-only bench runs of the PRE-change tree (worktree at the
# pre-slicer commit, $PRE) and the POST-change tree (/root/repo), at
# c32 then c8, so both sides see the same host state. Appends one line
# per run to $OUT: "<tag> <compact-bench-json>".
set -u
PRE=${PRE:-/tmp/graft_pre}
POST=${POST:-/root/repo}
OUT=${OUT:-/tmp/ab_extraction.log}
KG_N=${KG_N:-600000}

run() { # tag dir cpus
  local tag=$1 dir=$2 cpus=$3
  local line
  line=$(cd "$dir" && env SPARK_GRAFT_SKIP_QUERIES=1 SPARK_GRAFT_KG_N=$KG_N \
    SPARK_GRAFT_CPUS=$cpus SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' | tail -1)
  echo "$tag $line" >> "$OUT"
}

: > "$OUT"
for i in 1 2 3; do
  run "pre_c32_$i" "$PRE" 32
  run "post_c32_$i" "$POST" 32
done
for i in 1 2; do
  run "pre_c8_$i" "$PRE" 8
  run "post_c8_$i" "$POST" 8
done
echo "DONE" >> "$OUT"
