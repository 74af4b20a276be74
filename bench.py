"""Benchmark runner: prints ONE JSON line for the driver.

Current headline: negacyclic forward NTT throughput per chip at the
BASELINE.json target shape (n=16384, L=8 tower, batched) — the #1 kernel.
Will grow to the full CKKS mult+relin+rescale metric as the scheme lands.

Run on the real TPU (the environment's default backend); falls back to CPU.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from seal_tpu.modulus import CoeffModulus
    from seal_tpu.ops import modring, ntt as ntt_mod
    from seal_tpu.dtypes import to_device

    n = 16384
    log_n = 14
    L = 8
    batch = 4  # polys transformed per call
    moduli = [int(m) for m in CoeffModulus.create(n, [50] * L)]
    tables = ntt_mod.build_device_tables(log_n, moduli)

    rng = np.random.default_rng(0)
    x_host = np.stack(
        [rng.integers(0, q, size=(batch, n), dtype=np.uint64) for q in moduli], axis=1
    )
    x = to_device(x_host)

    iters = 8

    def many_ntt(x_pair):
        def body(i, pair):
            out = ntt_mod.ntt_forward(pair, tables, lazy=True)
            # keep values in range so the loop is stable: guard back to < q
            out = ntt_mod._guard(out, tables.mc.two_q)
            from seal_tpu.ops import limb

            return limb.cond_sub(out, tables.mc.q)

        return jax.lax.fori_loop(0, iters, body, x_pair)

    fn = jax.jit(many_ntt)
    out = fn(x)
    jax.block_until_ready(out)  # compile + first run

    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out = fn(x)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    total_ntts = reps * iters * batch * L  # single-prime n-point NTTs
    ntts_per_sec = total_ntts / dt
    platform = jax.devices()[0].platform

    print(json.dumps({
        "metric": f"negacyclic_ntt_n{n}_per_sec ({platform})",
        "value": round(ntts_per_sec, 2),
        "unit": "NTT/s/chip",
        "vs_baseline": 0.0,
    }))


if __name__ == "__main__":
    main()
