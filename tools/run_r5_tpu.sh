#!/bin/bash
# r5 TPU measurement queue (run serially after the batched small-n grid):
#   1. alpha sweep (fewer-transforms, VERDICT r4 item 8)
#   2. n=131072 pipeline rows (item 4)
#   3. feed overlap analysis (weak #7)
set -e
R=tools/results
echo "== alpha sweep n=16384 =="
for A in 3 4; do
  timeout 7200 python tools/bench_ops_tpu.py --ns 16384 --alpha $A --core-only 2>/dev/null
done | tee $R/alpha_sweep_16384_r5.log
echo "== alpha sweep n=32768 =="
for A in 3 5; do
  timeout 7200 python tools/bench_ops_tpu.py --ns 32768 --alpha $A --core-only 2>/dev/null
done | tee $R/alpha_sweep_32768_r5.log
echo "== huge n=131072 pipeline =="
timeout 10800 python tools/bench_ops_tpu.py --ns 131072 --core-only --out $R/huge131072_r05.json 2>/dev/null | tee $R/huge131072_r05.log
echo "== feed overlap analysis =="
timeout 5400 python tools/bench_sustained.py --total 256 --B 16 --overlap-analysis 2>/dev/null | tee $R/feed_overlap_r5.log
echo "r5 tpu queue done"
