"""jax.profiler trace harness for the flagship pipeline (SURVEY §5.1).

Captures a device trace of the CKKS mult+relin+rescale pipeline into
--logdir (open with TensorBoard / xprof), and prints the stage-level
attribution measured with the honest chained-differential method
(BASELINE.md r2) as a fallback when the tunnel blocks trace collection.

Usage:  python tools/profile_tpu.py [--logdir /tmp/seal_trace] [--attr-only]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logdir", default="/tmp/seal_tpu_trace")
    ap.add_argument("--attr-only", action="store_true",
                    help="skip the profiler trace, print attribution only")
    ap.add_argument("--alpha", type=int, default=1,
                    help="hybrid keyswitch special-prime count "
                         "(2 = same-budget BITS_ALPHA2 parms)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from seal_tpu import (
        CoeffModulus, EncryptionParameters, Encryptor, Evaluator,
        KeyGenerator, SEALContext,
    )
    from seal_tpu.encryption_params import SchemeType
    from seal_tpu.ckks import CKKSEncoder

    cpu = jax.devices("cpu")[0]
    target = jax.devices()[0]
    n = 16384
    parms = EncryptionParameters(SchemeType.CKKS)
    parms.set_poly_modulus_degree(n)
    bits = [48] * 8 + [54] if args.alpha == 1 else [44] * 8 + [43] * args.alpha
    parms.set_coeff_modulus(CoeffModulus.create(n, bits))
    parms.set_special_modulus_size(args.alpha)
    parms.set_random_seed((1, 2, 3, 4, 5, 6, 7, 8))
    with jax.default_device(cpu):
        ctx = SEALContext(parms)
        kg = KeyGenerator(ctx)
        pk = kg.create_public_key()
        rk = kg.create_relin_keys()
        enc = Encryptor(ctx, pk)
        ev = Evaluator(ctx)
        encoder = CKKSEncoder(ctx)
        vals = np.linspace(-1, 1, encoder.slot_count)
        ct1 = enc.encrypt(encoder.encode(vals, 2.0 ** 40))
        ct2 = enc.encrypt(encoder.encode(vals[::-1], 2.0 ** 40))
    rk.keys = [jax.device_put(k, target) if k is not None else None
               for k in rk.keys]
    B = 16
    d1 = jax.device_put(
        tuple(jnp.broadcast_to(d, (B,) + d.shape) for d in ct1.data), target)
    cd = ctx.get_context_data(ct1.parms_id)
    L = cd.coeff_modulus_size

    def wrap(pair):
        c = ct1.copy()
        c.data = pair
        return c

    stages = {}

    def mult_stage(p):
        cm = ev.multiply(wrap(p), wrap(p))
        return (cm.data[0][:2], cm.data[1][:2])

    def dec_stage(p):
        t_op = ev._switch_key_decompose(wrap(p), (p[0][1], p[1][1]))
        return (p[0].at[0].set(p[0][0] ^ t_op[0][0, :L]), p[1])

    def sk_stage(p):
        delta = ev._switch_key(wrap(p), (p[0][1], p[1][1]), rk.key(2))
        return (p[0].at[:2].set(delta.data[0] ^ p[0][:2]), p[1])

    def red_stage(p):
        # decompose + inner product only (no mod-down tail): full - this
        # = the P (or P·q_last) mod_down cost
        t_op = ev._switch_key_decompose(wrap(p), (p[0][1], p[1][1]))
        prod = ev._switch_key_reduce(wrap(p), t_op, rk.key(2))
        return (p[0].at[0].set(p[0][0] ^ prod[0][0][:L]), p[1])

    def rs_stage(p):
        out = ev.rescale_to_next(wrap(p))
        return (p[0].at[:, :L - 1].set(p[0][:, :L - 1] ^ out.data[0]), p[1])

    def measure(name, one):
        fn = jax.jit(lambda x, s: jax.lax.fori_loop(
            0, s, lambda i, c: jax.vmap(one)(c), x))
        o = fn(d1, 1)
        _ = np.asarray(o[0][0, 0, 0, :2])
        def run(s):
            t0 = time.perf_counter()
            o = fn(d1, s)
            _ = np.asarray(o[0][0, 0, 0, :2])
            return time.perf_counter() - t0
        run(2)
        # min each chain length separately, then subtract (min over
        # long-short pairs picks the most favorable noise draw)
        ts = min(run(2) for _ in range(3))
        tl = min(run(10) for _ in range(3))
        stages[name] = (tl - ts) / 8 / B
        print(f"{name}: {stages[name]*1e6:.0f} us/ct", flush=True)

    def seq_full(p):
        cm = ev.multiply(wrap(p), wrap(p))
        out = ev.rescale_to_next(ev.relinearize(cm, rk))
        lo = jnp.concatenate([out.data[0], p[0][:, L - 1:]], axis=1)
        hi = jnp.concatenate([out.data[1], p[1][:, L - 1:]], axis=1)
        return (lo, hi)

    def fused_full(p):
        # ONE mod-down by P*q_last (Evaluator.relinearize_rescale)
        cm = ev.multiply(wrap(p), wrap(p))
        out = ev.relinearize_rescale(cm, rk)
        lo = jnp.concatenate([out.data[0], p[0][:, L - 1:]], axis=1)
        hi = jnp.concatenate([out.data[1], p[1][:, L - 1:]], axis=1)
        return (lo, hi)

    with jax.default_device(target):
        measure("multiply", mult_stage)
        measure("switch_key_decompose", dec_stage)
        measure("switch_key_decompose_inner", red_stage)
        measure("switch_key_full", sk_stage)
        measure("rescale", rs_stage)
        measure("pipeline_sequential", seq_full)
        measure("pipeline_fused", fused_full)

        if not args.attr_only:
            fn = jax.jit(jax.vmap(seq_full))
            o = fn(d1)
            _ = np.asarray(o[0][0, 0, 0, :2])
            try:
                with jax.profiler.trace(args.logdir):
                    o = fn(d1)
                    _ = np.asarray(o[0][0, 0, 0, :2])
                print(f"trace written to {args.logdir}")
            except Exception as e:  # tunnel backends may not support tracing
                print(f"profiler trace unavailable here ({type(e).__name__}); "
                      f"attribution above is the record")

    print(json.dumps({k: round(v * 1e6, 1) for k, v in stages.items()}))


if __name__ == "__main__":
    main()
