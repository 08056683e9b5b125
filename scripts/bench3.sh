#!/usr/bin/env bash
# Best-of-3 bench protocol (round 13): three independent full graft.Bench
# runs, merged to the per-query minimum by scripts/bench_min.py and
# published as BENCH_MIN.json — so round-over-round comparison reads
# plans, not box weather (same-HEAD totals vary +/-7% with load).
set -euo pipefail
cd "$(dirname "$0")/.."
SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
N="${BENCH_RUNS:-3}"
outs=()
for i in $(seq 1 "$N"); do
  out="/tmp/bench_run$i.json"
  echo "[bench3] run $i/$N ..." >&2
  BENCH_OUT="$out" SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
    sbt -batch "runMain graft.Bench" > /dev/null
  outs+=("$out")
done
python3 scripts/bench_min.py "${outs[@]}" > BENCH_MIN.json
echo "[bench3] wrote BENCH_MIN.json" >&2
