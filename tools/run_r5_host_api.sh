#!/bin/bash
# Interleaved A/B for the host-API batch rows (VERDICT r4 item 1).
# Alternates the reference binary and our bench in ONE session on the same
# box, 3 rounds each; the analysis takes the per-row FASTEST of the 3
# (fair-measurement protocol, BASELINE.md r4 note).
#
# Prereqs: /tmp/ref_grid built from tools/oracle/bench_reference_grid.cpp.
set -e
OUT=tools/results/host_api_r5
mkdir -p "$OUT"
for round in 1 2 3; do
  echo "== round $round ref ==" >&2
  /tmp/ref_grid small        >> "$OUT/ref_small.jsonl"
  /tmp/ref_grid bgv_small    >> "$OUT/ref_bgv_small.jsonl"
  /tmp/ref_grid ckks_small   >> "$OUT/ref_ckks_small.jsonl"
  /tmp/ref_grid bfv          >> "$OUT/ref_bfv.jsonl"
  /tmp/ref_grid ckks         >> "$OUT/ref_ckks.jsonl"
  echo "== round $round ours ==" >&2
  python tools/bench_host_api.py bfv  2>/dev/null >> "$OUT/ours_bfv.jsonl"
  python tools/bench_host_api.py bgv  2>/dev/null >> "$OUT/ours_bgv.jsonl"
  python tools/bench_host_api.py ckks 2>/dev/null >> "$OUT/ours_ckks.jsonl"
done
echo "done; analyze with tools/analyze_host_api.py" >&2
