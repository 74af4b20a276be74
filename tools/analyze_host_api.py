"""Analyze the interleaved host-API A/B (tools/run_r5_host_api.sh output).

Per (scheme, n, row): the per-row FASTEST observation across the 3
interleaved rounds on each side (fair-measurement protocol). Prints a
markdown table: x86 µs, ours per-call µs, ours best batch-amortized µs
(B in {16, 64}), and the batch ratio x86/ours_batch (>1 = we win).
"""

from __future__ import annotations

import json
import pathlib
import sys

OUT = pathlib.Path(__file__).parent / "results" / "host_api_r5"
ROWS = ["encode", "decode", "encrypt_pk", "encrypt_sk", "decrypt"]


def _best(path):
    by_key = {}
    for line in path.read_text().splitlines():
        if not line.strip():
            continue
        d = json.loads(line)
        key = (d.get("scheme"), d["n"])
        dst = by_key.setdefault(key, {})
        for k, v in d["us"].items():
            if k not in dst or v < dst[k]:
                dst[k] = v
    return by_key


def main():
    pairs = [
        ("bfv", "ref_small.jsonl", "ours_bfv.jsonl", (1024, 2048)),
        ("bfv", "ref_bfv.jsonl", "ours_bfv.jsonl", (4096,)),
        ("bgv", "ref_bgv_small.jsonl", "ours_bgv.jsonl", (1024, 2048)),
        ("bgv", "ref_bfv.jsonl", "ours_bgv.jsonl", (4096,)),
        ("ckks", "ref_ckks_small.jsonl", "ours_ckks.jsonl", (1024, 2048)),
        ("ckks", "ref_ckks.jsonl", "ours_ckks.jsonl", (4096,)),
    ]
    print("| scheme | n | row | x86 µs | ours µs | ours batch µs (B) | "
          "batch ratio |")
    print("|---|---|---|---|---|---|---|")
    worst = []
    for scheme, ref_f, ours_f, ns in pairs:
        try:
            ref = _best(OUT / ref_f)
            ours = _best(OUT / ours_f)
        except FileNotFoundError:
            continue
        for n in ns:
            r = ref.get((scheme, n))
            o = ours.get((scheme, n))
            if not r or not o:
                continue
            for row in ROWS:
                if row not in r or row not in o:
                    continue
                batch = [(o[f"{row}_b{B}"], B) for B in (16, 64)
                         if f"{row}_b{B}" in o]
                if batch:
                    bv, bB = min(batch)
                    ratio = r[row] / bv
                    print(f"| {scheme} | {n} | {row} | {r[row]:.1f} | "
                          f"{o[row]:.1f} | {bv:.1f} (B={bB}) | "
                          f"**{ratio:.2f}** |")
                    if ratio < 1.0:
                        worst.append((scheme, n, row, ratio))
                else:
                    print(f"| {scheme} | {n} | {row} | {r[row]:.1f} | "
                          f"{o[row]:.1f} | — | — |")
    if worst:
        print(f"\nrows below 1.0 at best batch: {worst}", file=sys.stderr)
    else:
        print("\nall rows >= 1.0 at best batch", file=sys.stderr)


if __name__ == "__main__":
    main()
