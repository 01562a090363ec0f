#!/bin/bash
# Round-5 final measurement queue. Rules learned from r4 (VERDICT r4 #5):
#   - the final bench runs ALONE (no concurrent CPU suite);
#   - the patch-config probe runs FIRST so its record is in the store the
#     final bench reads (per_step_ms_patch passthrough);
#   - PARITY_r05 records at the SAME git as BENCH_r05, AFTER the bench.
# Usage: bash tools/measure_r05.sh [stage...]   (default: patch bench parity)
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site
LOG=MEASURE_r05.log
stages=${*:-"patch bench parity"}

echo "=== measure_r05 $(date -u +%FT%TZ) git $(git rev-parse --short HEAD) stages: $stages ===" | tee -a $LOG

for s in $stages; do
  case $s in
    patch)
      # TPU-exact plan-B costing: full 512² face-off step, dcn_impl='patch'
      echo "--- patch-DCN full step probe ---" | tee -a $LOG
      BENCH_DCN=patch BENCH_SKIP_FACE=1 BENCH_SKIP_BLUR=1 BENCH_BATCH=0 \
        BENCH_STEPS=2 BENCH_WAIT_S=600 timeout 5400 python bench.py 2>&1 | tee -a $LOG
      ;;
    bench)
      echo "--- full bench (headline + extras), uncontended ---" | tee -a $LOG
      BENCH_WAIT_S=1800 timeout 10800 python bench.py 2>&1 | tee -a $LOG
      ;;
    parity)
      echo "--- slow parity suite -> PARITY_r05.json ---" | tee -a $LOG
      JAX_PLATFORMS=cpu timeout 7200 python tools/record_parity.py 05 2>&1 | tee -a $LOG
      ;;
    multichip)
      echo "--- dryrun_multichip(8) smoke ---" | tee -a $LOG
      timeout 3600 python -c "
import __graft_entry__ as g; g.dryrun_multichip(8); print('multichip ok')" 2>&1 | tee -a $LOG
      ;;
    *) echo "unknown stage $s" ;;
  esac
done
echo "=== done $(date -u +%FT%TZ) ===" | tee -a $LOG
