#!/usr/bin/env bash
# CI entrypoint (parity: pipelines/pipeline-CI-Debug-*.yml in the reference —
# role, not format). One command, fails loudly, prints wall time.
#
#   ./ci.sh          # lint + full test suite on the CPU backend
#   ./ci.sh quick    # lint + the fast suites only (8-20 min, see below)
#
# The suite runs on a virtual 8-device CPU mesh (tests/conftest.py pins the
# backend and the persistent XLA compile cache at /root/.cache/jax; a cold
# cache roughly doubles the wall time). This sandbox exposes ONE CPU core:
# measured r2 full-suite wall = 18-28m for ~380 collected cases (warm cache;
# varies ~2x with shared-VM load). `quick` = 8-20 min under the same spread.
set -euo pipefail
cd "$(dirname "$0")"

start=$(date +%s)

echo "== lint: byte-compile all sources =="
python -m compileall -q seal_tpu tests tools examples bench.py __graft_entry__.py

echo "== import check =="
JAX_PLATFORMS=cpu python -c "
import jax; jax.config.update('jax_platforms', 'cpu')
import seal_tpu
from seal_tpu import parallel, serialization, valcheck
print('seal_tpu imports OK')"

if [[ "${1:-full}" == "quick" ]]; then
    echo "== quick suites =="
    python -m pytest tests/ -q -x \
        --ignore=tests/test_parallel.py \
        --ignore=tests/test_tp_keyswitch.py \
        --ignore=tests/test_multihost.py \
        --ignore=tests/test_examples.py \
        --ignore=tests/test_evaluator_reference.py \
        --ignore=tests/test_noise_budget_chain.py
else
    echo "== full suite =="
    python -m pytest tests/ -q
fi

echo "== CI green in $(( $(date +%s) - start ))s =="
