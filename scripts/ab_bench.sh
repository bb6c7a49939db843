#!/bin/bash
# Load-gated interleaved A/B solo bench: waits for the 1-min load
# average to drop below the gate before every run, then alternates
# NEW (working tree) and OLD (stash) bench.py --only runs.
# Usage: scripts/ab_bench.sh <queries-csv> <pairs> [runs-per-query]
set -e
Q="$1"; PAIRS="${2:-4}"; export SPARK_GRAFT_BENCH_RUNS="${3:-5}"
GATE="${AB_LOAD_GATE:-2.0}"
wait_quiet() {
  for _ in $(seq 1 60); do
    L=$(cut -d' ' -f1 /proc/loadavg)
    awk -v l="$L" -v g="$GATE" 'BEGIN{exit !(l<g)}' && return 0
    sleep 10
  done
}
for i in $(seq 1 "$PAIRS"); do
  wait_quiet
  python bench.py --only="$Q" 2>/dev/null | python3 -c "import json,sys; print('NEW', json.loads(sys.stdin.read())['queries'])"
  git stash -q
  wait_quiet
  python bench.py --only="$Q" 2>/dev/null | python3 -c "import json,sys; print('OLD', json.loads(sys.stdin.read())['queries'])"
  git stash pop -q
done
