#!/bin/bash
# Round-4 TPU measurement queue. Each stage independent + logged; rerun
# safely (compile cache warm). Usage: bash tools/measure_r04.sh [stage...]
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site
LOG=MEASURE_r04.log
stages=${*:-"step face blur patch bench"}

echo "=== measure_r04 $(date -u +%FT%TZ) stages: $stages ===" | tee -a $LOG

for s in $stages; do
  case $s in
    step)
      echo "--- bicubic step trace (leaf categories) ---" | tee -a $LOG
      timeout 4500 python -u tools/profile_step.py 512 10 40 2>&1 | tee -a $LOG
      ;;
    face)
      # face-window step forensics (VERDICT r3 #4: where do +1.7 s go)
      echo "--- face step trace ---" | tee -a $LOG
      timeout 5400 python -u tools/profile_step.py 512 10 40 face 2>&1 | tee -a $LOG
      ;;
    blur)
      # BlurUNet premium forensics (VERDICT r3 #5)
      echo "--- blur step trace ---" | tee -a $LOG
      timeout 5400 python -u tools/profile_step.py 512 10 40 blur 2>&1 | tee -a $LOG
      ;;
    batch2)
      echo "--- batch-2 step trace ---" | tee -a $LOG
      timeout 5400 python -u tools/profile_step.py 512 10 40 batch2 2>&1 | tee -a $LOG
      ;;
    patch)
      # TPU-exact plan-B: full 512² step with dcn_impl='patch'
      # (VERDICT r3 #7)
      echo "--- patch-DCN full step ---" | tee -a $LOG
      BENCH_DCN=patch BENCH_SKIP_FACE=1 BENCH_SKIP_BLUR=1 BENCH_BATCH=0 \
        BENCH_STEPS=2 BENCH_WAIT_S=600 timeout 5400 python bench.py 2>&1 | tee -a $LOG
      ;;
    bench)
      echo "--- full bench (headline + extras) ---" | tee -a $LOG
      BENCH_WAIT_S=1800 timeout 9000 python bench.py 2>&1 | tee -a $LOG
      ;;
    *) echo "unknown stage $s" ;;
  esac
done
echo "=== done $(date -u +%FT%TZ) ===" | tee -a $LOG
