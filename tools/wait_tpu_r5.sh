#!/usr/bin/env bash
# Poll the axon tunnel; when device init succeeds, run the r5 sweep.
set -u
cd "$(dirname "$0")/.."
probe() {
    timeout 300 python - <<'PYEOF' >/dev/null 2>&1
import jax
ds = jax.devices()
assert ds and ds[0].platform != "cpu", ds
PYEOF
}
echo "[watcher] polling axon tunnel"
i=0
while true; do
    i=$((i+1))
    if probe; then
        echo "[watcher] tunnel UP after $i probes ($(date -u +%H:%M:%S)); running r5 sweep"
        bash tools/run_r5_measurements.sh 2>&1 | tee tools/results/r5_sweep_console.log
        touch tools/results/r5_sweep.done
        exit 0
    fi
    echo "[watcher] probe $i failed ($(date -u +%H:%M:%S)); sleeping 120s"
    sleep 120
done
