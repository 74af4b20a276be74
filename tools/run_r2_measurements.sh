#!/usr/bin/env bash
# One-shot TPU measurement sweep for the round-2 kernel/algorithm changes:
#   1. headline bench --parity (alpha=1, SEAL-parity algorithm)
#   2. headline bench --hybrid (alpha=2 GHS digits, same depth + security),
#      --parity --fused (alpha=1 + fused tail), and the default
#      fastest mode (alpha=2 + fused relinearize_rescale)
#   3. NTT pair-compact A/B (ops/ntt_pallas.py butterfly formulations)
#   4. keyswitch inner-product A/B (fused Pallas kernel vs XLA loop)
# Each writes to tools/results/. Run on the real TPU; total ~30-45 min
# (dominated by tunnel remote-compiles).
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p tools/results
R=tools/results

run() {
    local name=$1; shift
    echo "== $name: $* =="
    timeout 2400 "$@" 2>&1 | tee "$R/$name.log" | tail -3
}

run headline_alpha1   python bench.py --parity
run headline_hybrid2  python bench.py --hybrid
run headline_fused    python bench.py --parity --fused
run headline_hyb2fus  python bench.py
run ntt_paircompact   python tools/bench_ntt_tpu.py --n 16384 --L 8 --batch 4
run ntt_rollselect    python tools/bench_ntt_tpu.py --n 16384 --L 8 --batch 4 --no-pair-compact
run ops_pallas_ks     python tools/bench_ops_tpu.py --ns 16384
run ops_xla_ks        python tools/bench_ops_tpu.py --ns 16384 --keyswitch-xla
run profile_attr      python tools/profile_tpu.py --attr-only

echo "== done; logs in $R/ =="
