#!/bin/bash
# Four-mode headline sweep (VERDICT r2 item 1). Each mode in its own process.
cd /root/repo
TS=$(date +%Y%m%d_%H%M%S)
for mode in "parity:--parity" "hybrid2:--hybrid" "fused1:--parity --fused" "hyb2fused:"; do
  name="${mode%%:*}"; flags="${mode#*:}"
  echo "=== mode=$name flags='$flags' $(date -u +%H:%M:%S) ==="
  timeout 1500 python bench.py $flags 2>&1 | tail -3 | tee tools/results/headline_r3_${name}.log
done
echo "=== sweep done $(date -u +%H:%M:%S) ==="
