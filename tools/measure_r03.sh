#!/bin/bash
# Round-3 TPU measurement queue (run when the axon tunnel is back).
# Each stage is independent and logged; re-run safely (compile cache warm).
# Usage: bash tools/measure_r03.sh [stage...]   (default: all)
set -u
cd "$(dirname "$0")/.."
LOG=MEASURE_r03.log
stages=${*:-"tile warp dispatch blur_exact batch4"}

echo "=== measure_r03 $(date -u +%FT%TZ) stages: $stages ===" | tee -a $LOG

for s in $stages; do
  case $s in
    tile)
      # kernel-lever sweep: lane_slice, (4,4)/(4,8)/(8,8) tiles, ntb
      echo "--- tile sweep ---" | tee -a $LOG
      timeout 5400 python tools/profile_ops.py tile 2>&1 | tee -a $LOG
      ;;
    warp)
      echo "--- flow_warp + dcn baselines ---" | tee -a $LOG
      timeout 3600 python tools/profile_ops.py warp dcn 2>&1 | tee -a $LOG
      ;;
    dispatch)
      # steps vs scan_p dispatch overhead at small size (same programs,
      # different dispatch granularity); VERDICT r2 #7
      echo "--- sampler dispatch compare ---" | tee -a $LOG
      timeout 3600 python tools/profile_dispatch.py 2>&1 | tee -a $LOG
      ;;
    blur_exact)
      # BlurUNet step with the exact-DCN fallback (VERDICT r2 #4)
      echo "--- blur step, exact DCN ---" | tee -a $LOG
      BENCH_DCN=exact BENCH_SKIP_FACE=1 BENCH_BATCH=0 BENCH_STEPS=2 \
        BENCH_WAIT_S=600 timeout 5400 python bench.py 2>&1 | tee -a $LOG
      ;;
    batch4)
      # serving throughput at 4 independent windows (HBM may not fit —
      # bench degrades gracefully via its per-variant try/except)
      echo "--- batch-4 serving throughput ---" | tee -a $LOG
      BENCH_BATCH=4 BENCH_SKIP_FACE=1 BENCH_SKIP_BLUR=1 BENCH_STEPS=2 \
        BENCH_WAIT_S=600 timeout 5400 python bench.py 2>&1 | tee -a $LOG
      ;;
    *) echo "unknown stage $s" ;;
  esac
done
echo "=== done $(date -u +%FT%TZ) ===" | tee -a $LOG
