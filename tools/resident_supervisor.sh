#!/bin/bash
# Keep a resident bench retry loop alive until a real TPU record lands or
# the machine dies. The first resident bench.py parent (12 h budget) plus
# tools/after_bench.sh cover the first window of tunnel uptime; this
# supervisor renews the resident loop when that budget exhausts with the
# tunnel still wedged, so a LATE uptime window (hours after the original
# budget) still produces BENCH_r03-grade measurements and then runs the
# round-3 measurement queue (tools/measure_r03.sh).
#
# Usage: resident_supervisor.sh [pid-of-current-bench-parent]
# Safe to re-run; refuses to double-start via a pid file.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site
LOG=MEASURE_r03.log
PIDFILE=/tmp/resident_super.pid
if [ -f "$PIDFILE" ] && kill -0 "$(cat $PIDFILE)" 2>/dev/null \
   && [ "$(cat $PIDFILE)" != "$$" ]; then
  echo "# supervisor already running (pid $(cat $PIDFILE))"; exit 0
fi
echo $$ > "$PIDFILE"

have_tpu_record() {
  [ -f .bench_last.json ] && grep -q '"platform": "axon"' .bench_last.json
}

# Phase 1: wait out the current resident parent (it owns the chip lock
# while probing; never kill it — killed-mid-op processes wedge the tunnel).
OLD=${1:-}
if [ -n "$OLD" ]; then
  while kill -0 "$OLD" 2>/dev/null; do sleep 120; done
fi

# Phase 2: renew in 4 h windows until a TPU record lands. after_bench.sh
# (attached to the ORIGINAL parent) runs the queue if the record landed in
# phase 1; detect that via its log line so the queue never double-runs.
queue_started() {
  grep -q "running measurement queue" "$LOG" 2>/dev/null
}

while ! have_tpu_record; do
  echo "# supervisor: renewing resident bench ($(date -u +%FT%TZ))" | tee -a $LOG
  BENCH_WAIT_S=14400 python bench.py >> .bench_r03.log 2>&1
done

if ! queue_started; then
  echo "# supervisor: TPU record landed; running measurement queue" | tee -a $LOG
  bash tools/measure_r03.sh
fi
