"""Batched-throughput benchmark (BASELINE.json config #5, single-chip leg):
a vmapped CKKS multiply+relinearize+rescale pipeline over a batch of
ciphertexts, reporting per-ciphertext throughput as the batch amortizes
fixed overheads. The multi-host legs run the same pipeline under a dp×tp
mesh (tests/test_parallel.py exercises the sharded correctness on the
virtual CPU mesh).

Run on the real TPU: python tools/bench_batched_tpu.py [--batch 8]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--L", type=int, default=8)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax

    from seal_tpu import (
        CoeffModulus, EncryptionParameters, Encryptor, Evaluator,
        KeyGenerator, SEALContext,
    )
    from seal_tpu.encryption_params import SchemeType
    from seal_tpu.ckks import CKKSEncoder
    from seal_tpu.parallel import batch_ciphertexts

    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = jax.devices()[0]
    target = jax.devices()[0]

    n = args.n
    parms = EncryptionParameters(SchemeType.CKKS)
    parms.set_poly_modulus_degree(n)
    parms.set_coeff_modulus(CoeffModulus.create(n, [48] * args.L + [54]))
    parms.set_random_seed((1, 2, 3, 4, 5, 6, 7, 8))

    with jax.default_device(cpu):
        ctx = SEALContext(parms)
        kg = KeyGenerator(ctx)
        pk = kg.create_public_key()
        rk = kg.create_relin_keys()
        enc = Encryptor(ctx, pk)
        ev = Evaluator(ctx)
        encoder = CKKSEncoder(ctx)
        scale = 2.0 ** 40
        vals = np.linspace(-1, 1, encoder.slot_count)
        a = batch_ciphertexts([
            enc.encrypt(encoder.encode(np.roll(vals, i), scale))
            for i in range(args.batch)
        ])
        b = batch_ciphertexts([
            enc.encrypt(encoder.encode(np.roll(vals[::-1], i), scale))
            for i in range(args.batch)
        ])

    a = jax.device_put(a, target)
    b = jax.device_put(b, target)
    rk.keys = [jax.device_put(k, target) if k is not None else None for k in rk.keys]

    def one(x_pair, y_pair):
        ca = a.copy(); ca.data = x_pair
        cb = b.copy(); cb.data = y_pair
        out = ev.rescale_to_next(ev.relinearize(ev.multiply(ca, cb), rk))
        return out.data

    with jax.default_device(target):
        fn = jax.jit(jax.vmap(one))
        out = fn(a.data, b.data)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        outs = [fn(a.data, b.data) for _ in range(args.reps)]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / args.reps

    per_ct = args.batch / dt
    print(json.dumps({
        "metric": f"ckks_n{n}_L{args.L}_mult_relin_rescale_batched ({target.platform})",
        "batch": args.batch,
        "value": round(per_ct, 3),
        "unit": "cts/s/chip",
        "batch_latency_ms": round(dt * 1e3, 2),
    }))


if __name__ == "__main__":
    main()
