#!/bin/bash
# Round-5 measurement queue #1: runs once the axon tunnel recovers.
# Order: chip liveness gate -> int8 rate probes -> step trace with the
# hoisted vsrpp -> quick bench per_step check.
cd /root/repo
log=/tmp/r5_queue1.log
: > "$log"

echo "# waiting for chip..." >> "$log"
for i in $(seq 1 240); do
  if timeout 90 python -c "
import jax, jax.numpy as jnp
print(float(jnp.ones((256,256)).sum()))" >/dev/null 2>&1; then
    echo "# chip up after $i probes" >> "$log"; break
  fi
  sleep 60
done

echo "=== probe_int8 uvp256 ===" >> "$log"
timeout 1800 python tools/probe_int8.py 256 >> "$log" 2>&1
echo "=== probe_int8 uvp384 ===" >> "$log"
timeout 1800 python tools/probe_int8.py 384 >> "$log" 2>&1
echo "=== profile_step bicubic (hoisted vsrpp) ===" >> "$log"
timeout 3600 python tools/profile_step.py 512 10 40 bicubic >> "$log" 2>&1
echo "=== done rc=$? ===" >> "$log"
