#!/usr/bin/env bash
# Repeat lane for the StreamingSpec transient flake (VERDICT r15 #1):
# run the suite N times (default 20), tee FULL sbt output per run, and
# keep going on failure so one soak characterizes the failure rate.
# Streaming-internals post-mortems land in target/streaming-progress/
# (per-run JSONL written by the suite's StreamingQueryListener).
#
# Usage: scripts/streaming_soak.sh [N] [logdir]
set -u
N="${1:-20}"
LOGDIR="${2:-/tmp/streaming_soak}"
mkdir -p "$LOGDIR"
cd "$(dirname "$0")/.."
pass=0; fail=0
for i in $(seq 1 "$N"); do
  log="$LOGDIR/run_$(printf '%02d' "$i").log"
  if sbt -batch "testOnly graft.StreamingSpec" >"$log" 2>&1 \
     && grep -q "All tests passed" "$log"; then
    pass=$((pass+1)); echo "run $i: PASS"
  else
    fail=$((fail+1)); echo "run $i: FAIL (log: $log)"
    grep -E "FAILED|\*\*\*|Exception" "$log" | head -20
  fi
done
echo "== streaming soak: $pass/$N passed, $fail failed (logs: $LOGDIR) =="
[ "$fail" -eq 0 ]
