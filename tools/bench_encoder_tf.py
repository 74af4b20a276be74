"""Device CKKS encoder grid rows at scale 2^50 — the triple-float route
(VERDICT r3 item 4 'a grid row at that scale'): df64 vs tf96 encode
marginals on the real chip, chained-differential methodology.

Run: python tools/bench_encoder_tf.py [--n 16384]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16384)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    os.makedirs("/root/.cache/jax", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from tools.bench_ops_tpu import BITS, _marginal

    from seal_tpu import CoeffModulus, EncryptionParameters, SEALContext
    from seal_tpu.encryption_params import SchemeType
    from seal_tpu.ckks import CKKSEncoder
    from seal_tpu.ops import cfft, cfft_tf

    n = args.n
    cpu = jax.devices("cpu")[0]
    parms = EncryptionParameters(SchemeType.CKKS)
    parms.set_poly_modulus_degree(n)
    parms.set_coeff_modulus(CoeffModulus.create(n, BITS[n]))
    with jax.default_device(cpu):
        ctx = SEALContext(parms)
        encoder = CKKSEncoder(ctx)
        pid = tuple(ctx.first_parms_id)
        fn_df = encoder._encode_fn(pid)
        fn_tf = encoder._encode_fn_tf(pid)

    rng = np.random.default_rng(0)
    bins = rng.uniform(-1, 1, n)
    us = {}
    with jax.default_device(jax.devices()[0]):
        # df64 row (scale 2^40: inside the 2^46-exact range)
        b4 = tuple(jnp.asarray(a) for a in
                   (cfft.df_from_f64(bins) + cfft.df_from_f64(bins[::-1].copy())))
        sc = tuple(jnp.float32(a) for a in cfft.df_from_f64(np.float64(2.0 ** 40)))

        def df_chain(x, steps_):
            def body(i, cur):
                rows = fn_df(cur, sc)
                f = (rows[0][0] & jnp.uint32(0xFFFF)).astype(
                    jnp.float32) * jnp.float32(2.0 ** -16)
                return (f, cur[1], cur[2], cur[3])
            return jax.lax.fori_loop(0, steps_, body, x)

        us["encode_device_df64_2p40"] = _marginal(df_chain, b4) * 1e6

        # tf96 row (scale 2^50: past the df64 cliff — exact on this route)
        b6 = tuple(jnp.asarray(a) for a in
                   (cfft_tf.tf_from_f64(bins)
                    + cfft_tf.tf_from_f64(bins[::-1].copy())))
        sc3 = tuple(jnp.float32(a) for a in
                    cfft_tf.tf_from_f64(np.float64(2.0 ** 50)))

        def tf_chain(x, steps_):
            def body(i, cur):
                rows = fn_tf(cur, sc3)
                f = (rows[0][0] & jnp.uint32(0xFFFF)).astype(
                    jnp.float32) * jnp.float32(2.0 ** -16)
                return (f,) + cur[1:]
            return jax.lax.fori_loop(0, steps_, body, x)

        us["encode_device_tf96_2p50"] = _marginal(tf_chain, b6) * 1e6

    print(json.dumps({"n": n, "us": {k: round(v, 1) for k, v in us.items()}}),
          flush=True)


if __name__ == "__main__":
    main()
