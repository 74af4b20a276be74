#!/usr/bin/env bash
# Poll the axon TPU tunnel; when device init succeeds, run the one-shot
# round-2 measurement sweep (tools/run_r2_measurements.sh). Intended to be
# left running in tmux during tunnel outages.
set -u
cd "$(dirname "$0")/.."
mkdir -p tools/results
MARKER=tools/results/r2_sweep.done

probe() {
    timeout 300 python - <<'EOF' >/dev/null 2>&1
import jax
ds = jax.devices()
assert ds and ds[0].platform != "cpu", ds
EOF
}

echo "[watcher] polling axon tunnel (probe timeout 300s, retry gap 120s)"
i=0
while true; do
    i=$((i+1))
    if probe; then
        echo "[watcher] tunnel UP after $i probes ($(date -u +%H:%M:%S)); running sweep"
        bash tools/run_r2_measurements.sh 2>&1 | tee tools/results/r2_sweep_console.log
        touch "$MARKER"
        echo "[watcher] sweep complete ($(date -u +%H:%M:%S))"
        exit 0
    fi
    echo "[watcher] probe $i failed ($(date -u +%H:%M:%S)); sleeping 120s"
    sleep 120
done
