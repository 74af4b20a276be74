"""Per-op TPU timing grid over n ∈ {4096, 8192, 16384, 32768} — the
BMEnv-style fixture of the reference bench (native/bench/bench.cpp:30-214)
at op granularity: multiply, relinearize, rescale, rotate, hoisted rotation
batch, device encode/decode FFT, raw NTT.

Honest methodology (BASELINE.md r2): `jax.block_until_ready` does not wait
on the tunneled backend, so every op is timed as a CHAINED jitted fori_loop
(output feeds the next input through a shape-restoring map) with a dynamic
step count, a forced host transfer, and a long-minus-short differential.

Run on the real TPU:  python tools/bench_ops_tpu.py [--ns 4096 16384] [--out report.json]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

# per-n coefficient bit allocations: data primes + special, at MaxBitCount
BITS = {
    1024: [27],
    2048: [54],
    4096: [36, 36, 37],
    8192: [43, 43, 43, 43, 46],
    16384: [48] * 8 + [54],
    32768: [55] * 15 + [56],
    # beyond the reference's own bench grid (its max is 32768): huge-n rows
    # for SEAL_POLY_MOD_DEGREE_MAX parity (VERDICT r3 item 6) — sec none,
    # tower sized to keep the keyswitch key under HBM limits
    65536: [55] * 15 + [56],
    131072: [55] * 15 + [56],
}

# --alpha 2: same data-prime count and total budget, 2 special primes
# (hybrid keyswitch; see docs/HYBRID_KEYSWITCH.md)
BITS_ALPHA2 = {
    4096: [27, 27, 27, 28],
    8192: [38, 38, 38, 38, 33, 33],
    16384: [44] * 8 + [43, 43],
    32768: [52] * 15 + [50, 51],
}

# higher-alpha sweep (VERDICT r4 item 8, "fewer transforms"): same data
# prime count and SAME TOTAL BUDGET per size, alpha special primes with
# P >= any digit modulus (docs/HYBRID_KEYSWITCH.md noise requirement).
# Fewer digits => fewer lifted NTT rows in the keyswitch decompose
# (ceil(L/alpha)*(L+alpha) rows), at the cost of data-scale budget.
BITS_BY_ALPHA = {
    3: {
        16384: [38] * 8 + [45, 45, 44],
        32768: [48] * 14 + [47] + [54, 54, 54],
    },
    4: {
        16384: [35] * 8 + [39, 39, 40, 40],
    },
    5: {
        32768: [42] * 14 + [43] + [50] * 5,
    },
}


def _marginal(fn, x0, short=8, long_=520, repeats=4, extra=()):
    """fn(x, steps, *extra) jitted; returns seconds per step (differential).

    Robustness rules (learned from a failed -249 µs "measurement"):
    take min over repeats of EACH chain length separately, then subtract —
    min-of-differences picks the most-negative noise sample; and grow the
    long chain until the differential clears 50 ms so multi-ms tunnel
    jitter cannot swamp the signal. `extra` args (e.g. key tensors) are
    passed as jit ARGUMENTS so they never serialize into the remote-compile
    payload; every OTHER closed-over array (expanded NTT root tables etc. —
    284 MB of u32 at n=32768) is hoisted out of the payload too, by tracing
    to a jaxpr and shipping the jaxpr consts as device-resident arguments
    (the axon remote-compile endpoint 413s above ~100 MB; jax.closure_convert
    can't do this — it only hoists inexact-dtype constants)."""
    import jax
    from jax import tree_util

    jpr, out_shape = jax.make_jaxpr(fn, return_shape=True)(x0, 1, *extra)
    out_tree = tree_util.tree_structure(out_shape)
    consts = [jax.device_put(c) for c in jpr.consts]

    @jax.jit
    def conv(consts_, x, s, *extra_):
        flat = tree_util.tree_leaves((x, s, *extra_))
        out = jax.core.eval_jaxpr(jpr.jaxpr, consts_, *flat)
        return tree_util.tree_unflatten(out_tree, out)

    o = conv(consts, x0, 1, *extra)
    _ = np.asarray(jax.tree.leaves(o)[0].reshape(-1)[:2])  # force completion

    def run(s):
        t0 = time.perf_counter()
        o = conv(consts, x0, s, *extra)
        _ = np.asarray(jax.tree.leaves(o)[0].reshape(-1)[:2])
        return time.perf_counter() - t0

    run(short)
    ts = min(run(short) for _ in range(repeats))
    tl = min(run(long_) for _ in range(repeats))
    while tl - ts < 0.05 and long_ < 20000:
        long_ *= 4
        tl = min(run(long_) for _ in range(repeats))
    return (tl - ts) / (long_ - short)


def bench_one(n: int, rotations: int = 8, alpha: int = 1,
              core_only: bool = False, batch: int = 1):
    import jax
    import jax.numpy as jnp

    from seal_tpu import (
        CoeffModulus, EncryptionParameters, Encryptor, Evaluator,
        KeyGenerator, SEALContext,
    )
    from seal_tpu.encryption_params import SchemeType
    from seal_tpu.ckks import CKKSEncoder
    from seal_tpu.ops import ntt as ntt_mod

    cpu = jax.devices("cpu")[0]
    target = jax.devices()[0]
    if alpha == 1:
        bits = BITS[n]
    elif alpha == 2:
        bits = BITS_ALPHA2[n]
    else:
        grid = BITS_BY_ALPHA.get(alpha, {})
        if n not in grid:
            raise SystemExit(
                f"no same-budget parms for alpha={alpha} at n={n}; "
                f"defined: " + ", ".join(
                    f"alpha={a}: n in {sorted(g)}"
                    for a, g in sorted(BITS_BY_ALPHA.items())))
        bits = grid[n]
    L = len(bits) - alpha
    parms = EncryptionParameters(SchemeType.CKKS)
    parms.set_poly_modulus_degree(n)
    parms.set_coeff_modulus(CoeffModulus.create(n, bits))
    parms.set_special_modulus_size(alpha)
    parms.set_random_seed((1, 2, 3, 4, 5, 6, 7, 8))

    with jax.default_device(cpu):
        if n > 32768:
            # beyond the HE-std table (the reference's MaxBitCount is also
            # 0 there): sec none, like its own huge-n usage would need
            from seal_tpu import SecLevelType
            ctx = SEALContext(parms, sec_level=SecLevelType.NONE)
        else:
            ctx = SEALContext(parms)
        kg = KeyGenerator(ctx)
        pk = kg.create_public_key()
        rk = kg.create_relin_keys()
        gt = ctx.key_context_data().galois_tool
        steps = [1 << i for i in range(rotations)]
        gk = kg.create_galois_keys(gt.get_elts_from_steps(steps))
        enc = Encryptor(ctx, pk)
        ev = Evaluator(ctx)
        encoder = CKKSEncoder(ctx)
        scale = 2.0 ** 40 if n > 4096 else 2.0 ** 30
        vals = np.linspace(-1, 1, encoder.slot_count)
        ct1 = enc.encrypt(encoder.encode(vals, scale))
        ct2 = enc.encrypt(encoder.encode(vals[::-1], scale))

    d1 = jax.device_put(ct1.data, target)
    d2 = jax.device_put(ct2.data, target)
    rkt = jax.device_put(rk.key(2), target)
    gk.keys = [jax.device_put(k, target) if k is not None else None for k in gk.keys]
    cd = ctx.first_context_data()
    us = {}

    def wrap(ct_proto, pair):
        c = ct_proto.copy()
        c.data = pair
        return c

    if batch > 1:
        # batched small-n device rows (VERDICT r4 item 2): the same chained
        # differentials with every step vmapped over a B-ciphertext stack —
        # the TPU's true per-ct throughput at small n, where B=1 shapes
        # underutilize the VPU. Reported per-ct (marginal / B).
        B = batch
        bcast = lambda pair: tuple(
            jnp.broadcast_to(a, (B,) + a.shape) for a in pair)
        d1b, d2b = bcast(d1), bcast(d2)
        with jax.default_device(target):
            def mult_chain(x, steps_):
                def step(cur):
                    cm = ev.multiply(wrap(ct1, cur), wrap(ct2, d2))
                    return (cm.data[0][:2], cm.data[1][:2])
                return jax.lax.fori_loop(
                    0, steps_, lambda i, cur: jax.vmap(step)(cur), x)
            us["multiply"] = _marginal(mult_chain, d1b) * 1e6 / B

            cm0 = jax.jit(jax.vmap(
                lambda a, b: ev.multiply(wrap(ct1, a), wrap(ct2, b)).data)
            )(d1b, d2b)
            ct3 = ct1.copy()

            from seal_tpu.dtypes import RelinKeys

            def _rk_like(kt):
                r = RelinKeys(); r.parms_id = rk.parms_id; r.keys = [kt]
                return r

            def relin_chain(x, steps_, key_tensor):
                def step(cur):
                    c = ct3.copy(); c.data = cur
                    out = ev.relinearize(c, _rk_like(key_tensor))
                    lo = jnp.concatenate([out.data[0], cur[0][2:]], axis=0)
                    hi = jnp.concatenate([out.data[1], cur[1][2:]], axis=0)
                    return (lo, hi)
                return jax.lax.fori_loop(
                    0, steps_, lambda i, cur: jax.vmap(step)(cur), x)
            us["relinearize"] = _marginal(
                relin_chain, cm0, extra=(rkt,)) * 1e6 / B

            def rs_chain(x, steps_):
                def step(cur):
                    out = ev.rescale_to_next(wrap(ct1, cur))
                    lo = jnp.concatenate(
                        [out.data[0], cur[0][:, L - 1:]], axis=1)
                    hi = jnp.concatenate(
                        [out.data[1], cur[1][:, L - 1:]], axis=1)
                    return (lo, hi)
                return jax.lax.fori_loop(
                    0, steps_, lambda i, cur: jax.vmap(step)(cur), x)
            us["rescale"] = _marginal(rs_chain, d1b) * 1e6 / B

            from seal_tpu.dtypes import GaloisKeys

            def _gk_like(keys_list):
                g = GaloisKeys()
                g.parms_id = gk.parms_id
                g.keys = list(keys_list)
                return g

            gkt = tuple(k for k in gk.keys if k is not None)
            gk_map = [i for i, k in enumerate(gk.keys) if k is not None]

            def _rebuild(keys_args):
                full = [None] * len(gk.keys)
                for slot, k in zip(gk_map, keys_args):
                    full[slot] = k
                return _gk_like(full)

            def rot_chain(x, steps_, keys_args):
                def step(cur):
                    return ev.rotate_vector(
                        wrap(ct1, cur), 1, _rebuild(keys_args)).data
                return jax.lax.fori_loop(
                    0, steps_, lambda i, cur: jax.vmap(step)(cur), x)
            us["rotate_one"] = _marginal(
                rot_chain, d1b, extra=(gkt,)) * 1e6 / B

            def ntt_chain(x, steps_):
                return jax.lax.fori_loop(
                    0, steps_,
                    lambda i, a: jax.vmap(
                        lambda p: ntt_mod.ntt_forward(p, cd.ntt_tables))(a),
                    x)
            us[f"ntt_forward_L{L}"] = _marginal(
                ntt_chain, (d1b[0][:, 0], d1b[1][:, 0])) * 1e6 / B
        return {"n": n, "L": L, "alpha": alpha, "batch": B,
                "us": {k: round(v, 2) for k, v in us.items()}}

    with jax.default_device(target):
        # multiply: keep first two rows so the loop carry keeps its shape
        def mult_chain(x, steps_):
            def body(i, cur):
                cm = ev.multiply(wrap(ct1, cur), wrap(ct2, d2))
                return (cm.data[0][:2], cm.data[1][:2])
            return jax.lax.fori_loop(0, steps_, body, x)
        us["multiply"] = _marginal(mult_chain, d1) * 1e6

        # relinearize: size-3 input rebuilt from the size-2 output + row 1
        cm0 = jax.jit(lambda a, b: ev.multiply(wrap(ct1, a), wrap(ct2, b)).data)(d1, d2)
        ct3 = wrap(ct1, cm0)
        ct3.data = cm0

        def relin_chain(x, steps_, key_tensor):
            def body(i, cur):
                c = ct3.copy(); c.data = cur
                out = ev.relinearize(c, _rk_like(key_tensor))
                lo = jnp.concatenate([out.data[0], cur[0][2:]], axis=0)
                hi = jnp.concatenate([out.data[1], cur[1][2:]], axis=0)
                return (lo, hi)
            return jax.lax.fori_loop(0, steps_, body, x)

        from seal_tpu.dtypes import RelinKeys

        def _rk_like(kt):
            r = RelinKeys(); r.parms_id = rk.parms_id; r.keys = [kt]
            return r
        us["relinearize"] = _marginal(
            relin_chain, cm0, extra=(rkt,)) * 1e6

        # rescale: pad the dropped row back
        def rs_chain(x, steps_):
            def body(i, cur):
                out = ev.rescale_to_next(wrap(ct1, cur))
                lo = jnp.concatenate([out.data[0], cur[0][:, L - 1:]], axis=1)
                hi = jnp.concatenate([out.data[1], cur[1][:, L - 1:]], axis=1)
                return (lo, hi)
            return jax.lax.fori_loop(0, steps_, body, x)
        us["rescale"] = _marginal(rs_chain, d1) * 1e6

        if core_only:
            # huge-n rows (VERDICT r3 item 6): the pipeline trio plus the
            # raw NTT — the rest of the grid is not defined at these sizes
            # in the reference either (its bench stops at 32768)
            def ntt_chain(x, steps_):
                return jax.lax.fori_loop(
                    0, steps_,
                    lambda i, a: ntt_mod.ntt_forward(a, cd.ntt_tables), x)
            us[f"ntt_forward_L{L}"] = _marginal(
                ntt_chain, (d1[0][0], d1[1][0])) * 1e6
            return {"n": n, "L": L, "alpha": alpha, "us":
                    {k: round(v, 1) for k, v in us.items()}}

        # rotation (shape-preserving: directly chainable); key tensors are
        # jit ARGUMENTS — closure key stacks blow the remote-compile payload
        from seal_tpu.dtypes import GaloisKeys

        def _gk_like(keys_list):
            g = GaloisKeys()
            g.parms_id = gk.parms_id
            g.keys = list(keys_list)
            return g

        gkt = tuple(k for k in gk.keys if k is not None)
        gk_map = [i for i, k in enumerate(gk.keys) if k is not None]

        def _rebuild(keys_args):
            full = [None] * len(gk.keys)
            for slot, k in zip(gk_map, keys_args):
                full[slot] = k
            return _gk_like(full)

        def rot_chain(x, steps_, keys_args):
            def body(i, cur):
                return ev.rotate_vector(wrap(ct1, cur), 1, _rebuild(keys_args)).data
            return jax.lax.fori_loop(0, steps_, body, x)
        us["rotate_one"] = _marginal(
            rot_chain, d1, extra=(gkt,)) * 1e6

        def hoist_chain(x, steps_, keys_args):
            def body(i, cur):
                outs = ev.rotate_batch_hoisted(
                    wrap(ct1, cur), steps, _rebuild(keys_args))
                return outs[0].data
            return jax.lax.fori_loop(0, steps_, body, x)
        us[f"rotate_{rotations}_hoisted"] = _marginal(
            hoist_chain, d1, extra=(gkt,)) * 1e6
        us[f"rotate_{rotations}_unhoisted"] = us["rotate_one"] * rotations

        # raw NTT over the L-tower
        def ntt_chain(x, steps_):
            return jax.lax.fori_loop(
                0, steps_, lambda i, a: ntt_mod.ntt_forward(a, cd.ntt_tables), x)
        us[f"ntt_forward_L{L}"] = _marginal(
            ntt_chain, (d1[0][0], d1[1][0])) * 1e6

        # device encoder (df64 FFT + round + RNS + NTT), per-vector marginal
        enc_fn = encoder._encode_fn(tuple(ctx.first_parms_id))
        bins = np.random.default_rng(0).uniform(-1, 1, n).astype(np.float32)
        b4 = tuple(jnp.asarray(x) for x in
                   (bins, np.zeros_like(bins), bins[::-1].copy(),
                    np.zeros_like(bins)))
        sc = (jnp.float32(scale), jnp.float32(0.0))

        def enc_chain(x, steps_):
            def body(i, cur):
                rows = enc_fn(cur, sc)   # [L, n] u32 pairs
                f = (rows[0][0] & jnp.uint32(0xFFFF)).astype(
                    jnp.float32) * jnp.float32(2.0 ** -16)
                return (f, cur[1], cur[2], cur[3])
            return jax.lax.fori_loop(0, steps_, body, x)
        us["encode_device"] = _marginal(enc_chain, b4) * 1e6

        # the remaining reference bench families (bench.cpp:46-152): square,
        # multiply_plain, add/sub ct+pt, negate — all shape-preserving or
        # shape-restorable device chains
        def sq_chain(x, steps_):
            def body(i, cur):
                cm = ev.square(wrap(ct1, cur))
                return (cm.data[0][:2], cm.data[1][:2])
            return jax.lax.fori_loop(0, steps_, body, x)
        us["square"] = _marginal(sq_chain, d1) * 1e6

        pt1 = encoder.encode(vals, scale)
        ptd = jax.device_put(pt1.rns_data, target)

        def _pt_like(rows):
            from seal_tpu.dtypes import Plaintext
            p = Plaintext()
            p.parms_id = pt1.parms_id
            p.scale = pt1.scale
            p.rns_data = rows
            return p

        def mulpt_chain(x, steps_, pt_rows):
            def body(i, cur):
                return ev.multiply_plain(wrap(ct1, cur), _pt_like(pt_rows)).data
            return jax.lax.fori_loop(0, steps_, body, x)
        us["mul_pt"] = _marginal(mulpt_chain, d1, extra=(ptd,)) * 1e6

        def addct_chain(x, steps_):
            def body(i, cur):
                return ev.add(wrap(ct1, cur), wrap(ct2, d2)).data
            return jax.lax.fori_loop(0, steps_, body, x)
        us["add_ct"] = _marginal(addct_chain, d1) * 1e6

        def addpt_chain(x, steps_, pt_rows):
            def body(i, cur):
                return ev.add_plain(wrap(ct1, cur), _pt_like(pt_rows)).data
            return jax.lax.fori_loop(0, steps_, body, x)
        us["add_pt"] = _marginal(addpt_chain, d1, extra=(ptd,)) * 1e6

        def sub_chain(x, steps_):
            def body(i, cur):
                return ev.sub(wrap(ct1, cur), wrap(ct2, d2)).data
            return jax.lax.fori_loop(0, steps_, body, x)
        us["sub_ct"] = _marginal(sub_chain, d1) * 1e6

        def neg_chain(x, steps_):
            def body(i, cur):
                return ev.negate(wrap(ct1, cur)).data
            return jax.lax.fori_loop(0, steps_, body, x)
        us["negate"] = _marginal(neg_chain, d1) * 1e6

    # host-orchestrated API ops (sampling + eager device math, wall-clock —
    # the same surface the reference bench times; runs the native host path)
    us.update(_host_api_rows(ctx, kg, enc, encoder, ct1, scale, vals))

    return {"n": n, "L": L, "alpha": alpha,
            "us": {k: round(v, 1) for k, v in us.items()},
            "hoisting_speedup": round(
                us[f"rotate_{rotations}_unhoisted"]
                / us[f"rotate_{rotations}_hoisted"], 2)}


def _wall_us(f, reps=10):
    f()
    t0 = time.perf_counter()
    for _ in range(reps):
        f()
    return (time.perf_counter() - t0) / reps * 1e6


def _host_api_rows(ctx, kg, enc, encoder, ct1, scale, vals):
    """Host-orchestrated API ops (PRNG sampling + eager math — the exact
    surface the reference bench times, bench.cpp:46-64): wall-clock on the
    CPU backend, native host path carrying the hot loop."""
    import jax

    from seal_tpu import Decryptor

    cpu = jax.devices("cpu")[0]
    rows = {}
    with jax.default_device(cpu):
        enc.set_key(kg.secret_key())
        dec = Decryptor(ctx, kg.secret_key())
        if scale is not None:
            pt = encoder.encode(vals, scale)
            rows["encode_host"] = _wall_us(lambda: encoder.encode(vals, scale))
            rows["decode_host"] = _wall_us(lambda: encoder.decode(pt))
        else:
            pt = encoder.encode(vals)
            rows["encode_host"] = _wall_us(lambda: encoder.encode(vals))
            rows["decode_host"] = _wall_us(lambda: encoder.decode(pt))
        rows["encrypt_pk"] = _wall_us(lambda: enc.encrypt(pt))
        rows["encrypt_sk"] = _wall_us(lambda: enc.encrypt_symmetric(pt))
        rows["decrypt"] = _wall_us(lambda: dec.decrypt(ct1))
    return rows


def bench_keygen(n: int):
    """KeyGen{Secret,Public,Relin,GaloisOne,GaloisAll} wall times — the
    reference's first bench family (bench.cpp:30-45); host-side by design
    (PRNG byte-stream exactness), carried by the native path."""
    import jax

    from seal_tpu import (
        CoeffModulus, EncryptionParameters, KeyGenerator, SEALContext,
    )
    from seal_tpu.encryption_params import SchemeType

    cpu = jax.devices("cpu")[0]
    bits = BITS[n]
    parms = EncryptionParameters(SchemeType.CKKS)
    parms.set_poly_modulus_degree(n)
    parms.set_coeff_modulus(CoeffModulus.create(n, bits))
    parms.set_random_seed((1, 2, 3, 4, 5, 6, 7, 8))

    us = {}
    with jax.default_device(cpu):
        ctx = SEALContext(parms)
        kg = KeyGenerator(ctx)  # warms tables + caches
        reps = 5 if n >= 16384 else 10
        us["keygen_secret"] = _wall_us(lambda: KeyGenerator(ctx), reps)
        us["keygen_public"] = _wall_us(lambda: kg.create_public_key(), reps)
        if ctx.using_keyswitching:
            us["keygen_relin"] = _wall_us(lambda: kg.create_relin_keys(), reps)
            gt = ctx.key_context_data().galois_tool
            elts = gt.get_elts_all()
            us["keygen_galois_one"] = _wall_us(
                lambda: kg.create_galois_keys([elts[0]]), reps)
            us["keygen_galois_all"] = _wall_us(
                lambda: kg.create_galois_keys(elts), 2)
    return {"n": n, "L": len(bits) - 1, "mode": "keygen",
            "us": {k: round(v, 1) for k, v in us.items()}}


def bench_small(n: int, batch: int = 1):
    """n ∈ {1024, 2048} default-parms rows (single prime — no keyswitching,
    matching bench.cpp:160-176's grid floor): BFV ops that exist there.
    batch > 1 vmaps every chain step over a B-ciphertext stack and reports
    per-ct marginals (VERDICT r4 item 2 small-n batched grid)."""
    import jax
    import jax.numpy as jnp

    from seal_tpu import (
        BatchEncoder, CoeffModulus, EncryptionParameters, Encryptor,
        Evaluator, KeyGenerator, SEALContext, SecLevelType,
    )
    from seal_tpu.encryption_params import SchemeType

    cpu = jax.devices("cpu")[0]
    target = jax.devices()[0]
    parms = EncryptionParameters(SchemeType.BFV)
    parms.set_poly_modulus_degree(n)
    parms.set_coeff_modulus(CoeffModulus.bfv_default(n))
    parms.set_plain_modulus(786433)
    parms.set_random_seed((1, 2, 3, 4, 5, 6, 7, 8))

    with jax.default_device(cpu):
        ctx = SEALContext(parms)
        kg = KeyGenerator(ctx)
        pk = kg.create_public_key()
        enc = Encryptor(ctx, pk)
        ev = Evaluator(ctx)
        encoder = BatchEncoder(ctx)
        vals = list(range(8)) + [0] * (encoder.slot_count - 8)
        ct1 = enc.encrypt(encoder.encode(vals))
        ct2 = enc.encrypt(encoder.encode(vals[::-1]))

    d1 = jax.device_put(ct1.data, target)
    d2 = jax.device_put(ct2.data, target)
    us = {}
    B = batch

    def wrap(proto, pair):
        c = proto.copy()
        c.data = pair
        return c

    if B > 1:
        d1 = tuple(jnp.broadcast_to(a, (B,) + a.shape) for a in d1)
        V = lambda step: (lambda cur: jax.vmap(step)(cur))
    else:
        V = lambda step: step

    with jax.default_device(target):
        def mult_chain(x, steps_):
            def step(cur):
                cm = ev.multiply(wrap(ct1, cur), wrap(ct2, d2))
                return (cm.data[0][:2], cm.data[1][:2])
            return jax.lax.fori_loop(
                0, steps_, lambda i, cur: V(step)(cur), x)
        us["multiply_behz"] = _marginal(mult_chain, d1, long_=136) * 1e6 / B

        def sq_chain(x, steps_):
            def step(cur):
                cm = ev.square(wrap(ct1, cur))
                return (cm.data[0][:2], cm.data[1][:2])
            return jax.lax.fori_loop(
                0, steps_, lambda i, cur: V(step)(cur), x)
        us["square"] = _marginal(sq_chain, d1, long_=136) * 1e6 / B

        def addct_chain(x, steps_):
            def step(cur):
                return ev.add(wrap(ct1, cur), wrap(ct2, d2)).data
            return jax.lax.fori_loop(
                0, steps_, lambda i, cur: V(step)(cur), x)
        us["add_ct"] = _marginal(addct_chain, d1) * 1e6 / B

        def neg_chain(x, steps_):
            def step(cur):
                return ev.negate(wrap(ct1, cur)).data
            return jax.lax.fori_loop(
                0, steps_, lambda i, cur: V(step)(cur), x)
        us["negate"] = _marginal(neg_chain, d1) * 1e6 / B

        def tontt_chain(x, steps_):
            def step(cur):
                up = ev.transform_to_ntt(wrap(ct1, cur))
                return ev.transform_from_ntt(up).data
            return jax.lax.fori_loop(
                0, steps_, lambda i, cur: V(step)(cur), x)
        us["to_from_ntt"] = _marginal(tontt_chain, d1) * 1e6 / B

    if B == 1:
        us.update(_host_api_rows(ctx, kg, enc, encoder, ct1, None, vals))
    L = len(ctx.first_context_data().parms.coeff_modulus)
    return {"n": n, "L": L, "scheme": "bfv", "mode": "small", "batch": B,
            "us": {k: round(v, 2) for k, v in us.items()}}


def bench_bfv(n: int, scheme_name: str = "bfv"):
    """BFV/BGV rows: BFV = the BEHZ 8-step multiply (the reference's
    heaviest op, evaluator.cpp:395-567); BGV = NTT-domain multiply with
    correction factors (evaluator.cpp:710-794); plus relinearize and
    modulus switch for both."""
    import jax
    import jax.numpy as jnp

    from seal_tpu import (
        BatchEncoder, CoeffModulus, EncryptionParameters, Encryptor,
        Evaluator, KeyGenerator, PlainModulus, SEALContext,
    )
    from seal_tpu.encryption_params import SchemeType
    from seal_tpu.dtypes import RelinKeys

    cpu = jax.devices("cpu")[0]
    target = jax.devices()[0]
    bits = BITS[n]
    L = len(bits) - 1
    parms = EncryptionParameters(
        SchemeType.BGV if scheme_name == "bgv" else SchemeType.BFV)
    parms.set_poly_modulus_degree(n)
    parms.set_coeff_modulus(CoeffModulus.create(n, bits))
    parms.set_plain_modulus(PlainModulus.batching(n, 20))
    parms.set_random_seed((1, 2, 3, 4, 5, 6, 7, 8))

    with jax.default_device(cpu):
        ctx = SEALContext(parms)
        kg = KeyGenerator(ctx)
        pk = kg.create_public_key()
        rk = kg.create_relin_keys()
        enc = Encryptor(ctx, pk)
        ev = Evaluator(ctx)
        encoder = BatchEncoder(ctx)
        vals = list(range(8)) + [0] * (encoder.slot_count - 8)
        ct1 = enc.encrypt(encoder.encode(vals))
        ct2 = enc.encrypt(encoder.encode(vals[::-1]))

    d1 = jax.device_put(ct1.data, target)
    d2 = jax.device_put(ct2.data, target)
    rkt = jax.device_put(rk.key(2), target)
    us = {}

    def wrap(proto, pair):
        c = proto.copy()
        c.data = pair
        return c

    def _rk_like(kt):
        r = RelinKeys(); r.parms_id = rk.parms_id; r.keys = [kt]
        return r

    with jax.default_device(target):
        def mult_chain(x, steps_):
            def body(i, cur):
                cm = ev.multiply(wrap(ct1, cur), wrap(ct2, d2))
                return (cm.data[0][:2], cm.data[1][:2])
            return jax.lax.fori_loop(0, steps_, body, x)
        mult_key = "multiply_behz" if scheme_name == "bfv" else "multiply"
        us[mult_key] = _marginal(mult_chain, d1, long_=136) * 1e6

        cm0 = jax.jit(
            lambda a, b: ev.multiply(wrap(ct1, a), wrap(ct2, b)).data)(d1, d2)
        ct3 = wrap(ct1, cm0)

        def relin_chain(x, steps_, key_tensor):
            def body(i, cur):
                c = ct3.copy(); c.data = cur
                out = ev.relinearize(c, _rk_like(key_tensor))
                lo = jnp.concatenate([out.data[0], cur[0][2:]], axis=0)
                hi = jnp.concatenate([out.data[1], cur[1][2:]], axis=0)
                return (lo, hi)
            return jax.lax.fori_loop(0, steps_, body, x)
        us["relinearize"] = _marginal(relin_chain, cm0, extra=(rkt,)) * 1e6

        def ms_chain(x, steps_):
            def body(i, cur):
                out = ev.mod_switch_to_next(wrap(ct1, cur))
                lo = jnp.concatenate([out.data[0], cur[0][:, L - 1:]], axis=1)
                hi = jnp.concatenate([out.data[1], cur[1][:, L - 1:]], axis=1)
                return (lo, hi)
            return jax.lax.fori_loop(0, steps_, body, x)
        us["mod_switch"] = _marginal(ms_chain, d1) * 1e6

        def sq_chain(x, steps_):
            def body(i, cur):
                cm = ev.square(wrap(ct1, cur))
                return (cm.data[0][:2], cm.data[1][:2])
            return jax.lax.fori_loop(0, steps_, body, x)
        us["square"] = _marginal(sq_chain, d1, long_=136) * 1e6

        pt1 = encoder.encode(vals)

        def mulpt_chain(x, steps_):
            def body(i, cur):
                return ev.multiply_plain(wrap(ct1, cur), pt1).data
            return jax.lax.fori_loop(0, steps_, body, x)
        us["mul_pt"] = _marginal(mulpt_chain, d1) * 1e6

        def addct_chain(x, steps_):
            def body(i, cur):
                return ev.add(wrap(ct1, cur), wrap(ct2, d2)).data
            return jax.lax.fori_loop(0, steps_, body, x)
        us["add_ct"] = _marginal(addct_chain, d1) * 1e6

        def neg_chain(x, steps_):
            def body(i, cur):
                return ev.negate(wrap(ct1, cur)).data
            return jax.lax.fori_loop(0, steps_, body, x)
        us["negate"] = _marginal(neg_chain, d1) * 1e6

        if scheme_name == "bfv":
            def tontt_chain(x, steps_):
                def body(i, cur):
                    up = ev.transform_to_ntt(wrap(ct1, cur))
                    return ev.transform_from_ntt(up).data
                return jax.lax.fori_loop(0, steps_, body, x)
            us["to_from_ntt"] = _marginal(tontt_chain, d1) * 1e6

    us.update(_host_api_rows(ctx, kg, enc, encoder, ct1, None, vals))
    return {"n": n, "L": L, "scheme": scheme_name,
            "us": {k: round(v, 1) for k, v in us.items()}}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ns", type=int, nargs="*", default=[4096, 8192, 16384, 32768])
    ap.add_argument("--rotations", type=int, default=8)
    ap.add_argument("--scheme",
                    choices=["ckks", "bfv", "bgv", "keygen", "small"],
                    default="ckks")
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--keyswitch-xla", action="store_true",
                    help="A/B: force the XLA key-switch inner product "
                         "(default: fused Pallas kernel on TPU)")
    ap.add_argument("--core-only", action="store_true",
                    help="CKKS rows: only multiply/relinearize/rescale/NTT "
                         "(huge-n grid)")
    ap.add_argument("--alpha", type=int, default=1,
                    help="hybrid keyswitch special-prime count (CKKS rows "
                         "only; 2 uses the BITS_ALPHA2 same-budget parms)")
    ap.add_argument("--batch", type=int, default=1,
                    help="vmap the core CKKS rows over a B-ciphertext "
                         "stack and report per-ct marginals (small-n "
                         "batched grid, VERDICT r4 item 2)")
    args = ap.parse_args()
    # persistent compile cache: tunnel compiles cost minutes; repeats hit disk
    import os

    import jax

    os.makedirs("/root/.cache/jax", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    if args.keyswitch_xla:
        from seal_tpu.config import config as _cfg
        _cfg.use_pallas_keyswitch = "never"
    reports = []
    if args.scheme == "small" and args.ns == [4096, 8192, 16384, 32768]:
        args.ns = [1024, 2048]
    for n in args.ns:
        t0 = time.time()
        if args.scheme == "ckks":
            rep = bench_one(n, args.rotations, args.alpha,
                            core_only=args.core_only, batch=args.batch)
        elif args.scheme == "keygen":
            rep = bench_keygen(n)
        elif args.scheme == "small":
            rep = bench_small(n, batch=args.batch)
        else:
            rep = bench_bfv(n, args.scheme)
        rep["bench_wall_s"] = round(time.time() - t0, 1)
        print(json.dumps(rep), flush=True)
        reports.append(rep)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(reports, f, indent=2)


if __name__ == "__main__":
    main()
