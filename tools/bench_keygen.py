"""KeyGen timing rows (reference bench family KeyGen{Secret,Public,Relin,
Galois}, native/bench/bench.cpp:30-60). Key generation is host-side by
design in seal_tpu (SURVEY §2.7 — PRNG stream exactness lives on the host;
keys are then device-resident for the op pipelines), so these are wall
times of the host path, not device kernels.

Run: python tools/bench_keygen.py [--ns 4096 8192 16384]
"""

from __future__ import annotations

import argparse
import json
import time

BITS = {
    1024: [27],
    2048: [54],
    4096: [36, 36, 37],
    8192: [43, 43, 43, 43, 46],
    16384: [48] * 8 + [54],
    32768: [55] * 15 + [56],
}


def bench_one(n: int):
    import jax

    from seal_tpu import (
        CoeffModulus, EncryptionParameters, KeyGenerator, SEALContext,
    )
    from seal_tpu.encryption_params import SchemeType

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        parms = EncryptionParameters(SchemeType.CKKS)
        parms.set_poly_modulus_degree(n)
        parms.set_coeff_modulus(CoeffModulus.create(n, BITS[n]))
        parms.set_random_seed((1, 2, 3, 4, 5, 6, 7, 8))

        t0 = time.perf_counter()
        ctx = SEALContext(parms)
        t_ctx = time.perf_counter() - t0

        t0 = time.perf_counter()
        kg = KeyGenerator(ctx)
        t_sk = time.perf_counter() - t0

        t0 = time.perf_counter()
        kg.create_public_key()
        t_pk = time.perf_counter() - t0

        ms = {}
        if len(BITS[n]) > 1:  # keyswitching requires >= 2 primes
            t0 = time.perf_counter()
            kg.create_relin_keys()
            ms["relin_keys"] = time.perf_counter() - t0

            gt = ctx.key_context_data().galois_tool
            t0 = time.perf_counter()
            kg.create_galois_keys([gt.get_elt_from_step(1)])
            ms["galois_key_one"] = time.perf_counter() - t0

    out = {"n": n, "ms": {k: round(v * 1e3, 1) for k, v in {
        "context": t_ctx, "secret_key": t_sk, "public_key": t_pk, **ms,
    }.items()}}
    print(json.dumps(out), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ns", type=int, nargs="*", default=[4096, 8192, 16384])
    args = ap.parse_args()
    for n in args.ns:
        bench_one(n)


if __name__ == "__main__":
    main()
