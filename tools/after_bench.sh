#!/bin/bash
# Orchestrator: wait for the resident bench retry loop (bench.py parent) to
# finish; if it landed a real TPU record, run the round-3 measurement queue.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site
PID=${1:?usage: after_bench.sh <bench-parent-pid>}
while kill -0 "$PID" 2>/dev/null; do sleep 60; done
echo "# bench parent $PID exited at $(date -u +%FT%TZ)" | tee -a MEASURE_r03.log
if [ -f .bench_last.json ] && grep -q '"platform": "axon"' .bench_last.json; then
  echo "# TPU record landed; running measurement queue" | tee -a MEASURE_r03.log
  bash tools/measure_r03.sh
else
  echo "# no TPU record (.bench_last.json missing or non-axon); queue skipped" \
    | tee -a MEASURE_r03.log
fi
