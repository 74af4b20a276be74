#!/usr/bin/env bash
# r5 session-2 sweep: reordered for a cold compile cache + ~1h budget.
set -u
cd "$(dirname "$0")/.."
R=tools/results
run() {  # run <timeout_s> <log> <cmd...>
    echo "== $2 ($(date -u +%H:%M:%S)) =="
    timeout "$1" "${@:3}" > "$R/$2" 2>&1
    tail -3 "$R/$2"
}
# 1. headline + saturation (warms driver's end-of-round bench; BASELINE refresh)
run 5400 headline_r5.log python bench.py 1 4 16 32
# 2. fewer-transforms alpha sweep at the headline size (VERDICT item 8)
run 5400 alpha4_16384_r5.log python tools/bench_ops_tpu.py --ns 16384 --alpha 4 --core-only
run 5400 alpha3_16384_r5.log python tools/bench_ops_tpu.py --ns 16384 --alpha 3 --core-only
# 3. n=131072 pipeline rows (item 4)
run 10800 huge131072_r05.log python tools/bench_ops_tpu.py --ns 131072 --core-only --out $R/huge131072_r05.json
# 4. sustained + feed overlap (weak #7)
run 5400 sustained_r5.log python tools/bench_sustained.py --total 4096 --B 64 --submap 16
run 5400 feed_overlap_r5.log python tools/bench_sustained.py --total 256 --B 16 --overlap-analysis
# 5. batched retries
run 5400 batched4096_b64_r5.log python tools/bench_ops_tpu.py --scheme ckks --ns 4096 --batch 64
run 5400 batched_small_b16_r5.log python tools/bench_ops_tpu.py --scheme small --ns 1024 --batch 16
# 6. alpha sweep at n=32768 (lowest priority)
run 5400 alpha3_32768_r5.log python tools/bench_ops_tpu.py --ns 32768 --alpha 3 --core-only
run 5400 alpha5_32768_r5.log python tools/bench_ops_tpu.py --ns 32768 --alpha 5 --core-only
echo "r5b sweep done ($(date -u +%H:%M:%S))"
