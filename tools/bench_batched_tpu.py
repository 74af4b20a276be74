"""Batched-throughput benchmark (BASELINE.json config #5, single-chip leg).

Superseded by `python bench.py B1 B2 ...` — the headline runner's
batch-saturation mode, which uses the honest chained-differential
methodology (`jax.block_until_ready` does not wait on the tunneled
backend; the original implementation of this tool used it and measured
dispatch, not the device). This entry point remains for compatibility and
simply delegates.

Run on the real TPU: python tools/bench_batched_tpu.py [--batches 1 4 16 32]
"""

from __future__ import annotations

import argparse
import pathlib
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="*", default=[1, 4, 16, 32])
    args = ap.parse_args()
    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
    import bench

    bench.main(tuple(args.batches))


if __name__ == "__main__":
    main()
