"""Per-op TPU timings for the headline CKKS n=16384 L=8 config
(BASELINE.json configs #1/#4): multiply, relinearize, rescale, rotate,
hoisted rotation batch, and the raw NTT. Mirrors the reference bench
families (native/bench/bench.cpp:30-152) at the op granularity.

Run on the real TPU: python tools/bench_ops_tpu.py [--n 16384] [--reps 5]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def time_op(fn, args, reps):
    import jax

    out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    jax.block_until_ready(jax.tree.leaves(outs))
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--L", type=int, default=8)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--rotations", type=int, default=8)
    args = ap.parse_args()

    import jax

    from seal_tpu import (
        CoeffModulus, EncryptionParameters, Encryptor, Evaluator,
        KeyGenerator, SEALContext,
    )
    from seal_tpu.encryption_params import SchemeType
    from seal_tpu.ckks import CKKSEncoder

    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = jax.devices()[0]
    target = jax.devices()[0]

    n = args.n
    bits = [48] * args.L + [54]
    parms = EncryptionParameters(SchemeType.CKKS)
    parms.set_poly_modulus_degree(n)
    parms.set_coeff_modulus(CoeffModulus.create(n, bits))
    parms.set_random_seed((1, 2, 3, 4, 5, 6, 7, 8))

    with jax.default_device(cpu):
        ctx = SEALContext(parms)
        kg = KeyGenerator(ctx)
        pk = kg.create_public_key()
        rk = kg.create_relin_keys()
        gt = ctx.key_context_data().galois_tool
        steps = [1 << i for i in range(args.rotations)]
        gk = kg.create_galois_keys(gt.get_elts_from_steps(steps))
        enc = Encryptor(ctx, pk)
        ev = Evaluator(ctx)
        encoder = CKKSEncoder(ctx)
        scale = 2.0 ** 40
        vals = np.linspace(-1, 1, encoder.slot_count)
        ct1 = enc.encrypt(encoder.encode(vals, scale))
        ct2 = enc.encrypt(encoder.encode(vals[::-1], scale))

    ct1 = jax.device_put(ct1, target)
    ct2 = jax.device_put(ct2, target)
    rk.keys = [jax.device_put(k, target) if k is not None else None for k in rk.keys]
    gk.keys = [jax.device_put(k, target) if k is not None else None for k in gk.keys]

    # JitEvaluator passes key tensors as jit ARGUMENTS (device parameters),
    # not closure constants — closure key stacks get serialized into the
    # remote-compile payload and blow its size limit.
    from seal_tpu import JitEvaluator

    jev = JitEvaluator(ctx)
    jev.evaluator = ev

    results = {}
    with jax.default_device(target):
        results["multiply"] = time_op(jev.multiply, (ct1, ct2), args.reps)
        ct3 = jev.multiply(ct1, ct2)

        results["relinearize"] = time_op(jev.relinearize, (ct3, rk), args.reps)
        ct4 = jev.relinearize(ct3, rk)

        results["rescale"] = time_op(jev.rescale_to_next, (ct4,), args.reps)
        results["square"] = time_op(jev.square, (ct1,), args.reps)

        results["rotate_one"] = time_op(
            jev.rotate_vector, (ct1, 1, gk), args.reps)

        # unhoisted k-rotation cost = k sequential single rotations
        results[f"rotate_{args.rotations}_unhoisted"] = (
            results["rotate_one"] * args.rotations)

        results[f"rotate_{args.rotations}_hoisted"] = time_op(
            jev.rotate_batch_hoisted, (ct1, steps, gk), args.reps)

        cd = ctx.first_context_data()
        from seal_tpu.ops import ntt as ntt_mod
        fwd = jax.jit(lambda p: ntt_mod.ntt_forward(p, cd.ntt_tables))
        p0 = ct1.poly(0)
        results["ntt_forward_L8"] = time_op(fwd, (p0,), max(args.reps, 20))

    report = {
        "config": f"ckks n={n} L={args.L} ({target.platform})",
        "us": {k: round(v * 1e6, 1) for k, v in results.items()},
        "hoisting_speedup": round(
            results[f"rotate_{args.rotations}_unhoisted"]
            / results[f"rotate_{args.rotations}_hoisted"], 2),
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
