#!/bin/bash
# All four demo tasks on the bundled reference clips — the TPU counterpart
# of the reference's scripts/demo.bash:4-10 (its de-facto integration test).
# Serving config: 25-step guided DDIM (driver metric spacing); pass
# different flags through $EXTRA, e.g. EXTRA="--steps 100 --sampler ddpm".
set -eu
cd "$(dirname "$0")/.."
DATA=${DATA:-/root/reference/data}
OUT=${OUT:-results}
EXTRA=${EXTRA:---sampler ddim --steps 25}

for task in gaussian jpeg x8_bicubic x16_bicubic; do
  echo "=== $task ==="
  python -m flair_tpu.cli "$task" \
    --input-dir "$DATA/$task" --output-dir "$OUT/$task" $EXTRA
done
