"""Host-API rows: per-call AND batch-amortized (encode/encrypt/decrypt_many).

Ours-side of the interleaved A/B against tools/oracle/bench_reference_grid
(same parms rows: bfv/bgv small n in {1024, 2048} plain 786433, the grid
n=4096 batching-20 row, ckks_small BFVDefault single prime). Per-op numbers
use the reference harness's semantics — one warmup call, then the MEAN over
`reps` timed calls; batch rows divide the batch-call mean by B.

Run: python tools/bench_host_api.py [bfv|bgv|ckks] [--batches 16 64]
Emits one JSON line per (n, mode) like the reference binary, with rows
<name> (per-call) and <name>_bB (amortized per-op at batch B).
"""

from __future__ import annotations

import argparse
import json
import time


def _time_us(f, reps: int) -> float:
    f()
    t0 = time.perf_counter()
    for _ in range(reps):
        f()
    return (time.perf_counter() - t0) * 1e6 / reps


def _emit(n, L, scheme, mode, us):
    rows = ", ".join(f'"{k}": {v:.1f}' for k, v in us.items())
    print(f'{{"n": {n}, "L": {L}, "scheme": "{scheme}", '
          f'"mode": "{mode}", "us": {{{rows}}}}}', flush=True)


def bench_bfv(n, bits, plain, batches, bgv=False, reps=50):
    import numpy as np

    from seal_tpu import (
        BatchEncoder, CoeffModulus, Decryptor, EncryptionParameters,
        Encryptor, KeyGenerator, SEALContext,
    )
    from seal_tpu.encryption_params import SchemeType

    parms = EncryptionParameters(SchemeType.BGV if bgv else SchemeType.BFV)
    parms.set_poly_modulus_degree(n)
    parms.set_coeff_modulus(
        CoeffModulus.create(n, bits) if bits else CoeffModulus.bfv_default(n))
    parms.set_plain_modulus(plain)
    ctx = SEALContext(parms)
    kg = KeyGenerator(ctx)
    enc = Encryptor(ctx, kg.create_public_key(), kg.secret_key())
    dec = Decryptor(ctx, kg.secret_key())
    be = BatchEncoder(ctx)

    vals = np.zeros(be.slot_count, dtype=np.uint64)
    vals[:8] = np.arange(1, 9)
    p1 = be.encode(vals)
    c1 = enc.encrypt(p1)

    us = {}
    us["encode"] = _time_us(lambda: be.encode(vals), reps)
    us["decode"] = _time_us(lambda: be.decode(p1), reps)
    us["encrypt_pk"] = _time_us(lambda: enc.encrypt(p1), reps)
    us["encrypt_sk"] = _time_us(lambda: enc.encrypt_symmetric(p1), reps)
    us["decrypt"] = _time_us(lambda: dec.decrypt(c1), reps)
    for B in batches:
        vb = np.tile(vals, (B, 1))
        pb = be.encode_many(vb)
        cb = enc.encrypt_many(pb)
        breps = max(3, reps // B)
        us[f"encode_b{B}"] = _time_us(lambda: be.encode_many(vb), breps) / B
        us[f"decode_b{B}"] = _time_us(lambda: be.decode_many(pb), breps) / B
        us[f"encrypt_pk_b{B}"] = _time_us(
            lambda: enc.encrypt_many(pb), breps) / B
        us[f"encrypt_sk_b{B}"] = _time_us(
            lambda: enc.encrypt_symmetric_many(pb), breps) / B
        us[f"decrypt_b{B}"] = _time_us(
            lambda: dec.decrypt_many(cb), breps) / B
    L = ctx.first_context_data().coeff_modulus_size
    _emit(n, L, "bgv" if bgv else "bfv", "host_api", us)


def bench_ckks(n, bits, scale, batches, reps=50):
    import numpy as np

    from seal_tpu import (
        CKKSEncoder, CoeffModulus, Decryptor, EncryptionParameters,
        Encryptor, KeyGenerator, SEALContext,
    )
    from seal_tpu.encryption_params import SchemeType

    parms = EncryptionParameters(SchemeType.CKKS)
    parms.set_poly_modulus_degree(n)
    parms.set_coeff_modulus(
        CoeffModulus.create(n, bits) if bits else CoeffModulus.bfv_default(n))
    ctx = SEALContext(parms)
    kg = KeyGenerator(ctx)
    enc = Encryptor(ctx, kg.create_public_key(), kg.secret_key())
    dec = Decryptor(ctx, kg.secret_key())
    ce = CKKSEncoder(ctx)
    vals = np.linspace(-1.0, 1.0, ce.slot_count)
    p1 = ce.encode(vals, scale)
    c1 = enc.encrypt(p1)

    us = {}
    us["encode"] = _time_us(lambda: ce.encode(vals, scale), reps)
    us["decode"] = _time_us(lambda: ce.decode(p1), reps)
    us["encrypt_pk"] = _time_us(lambda: enc.encrypt(p1), reps)
    us["encrypt_sk"] = _time_us(lambda: enc.encrypt_symmetric(p1), reps)
    us["decrypt"] = _time_us(lambda: dec.decrypt(c1), reps)
    for B in batches:
        vb = np.tile(vals, (B, 1))
        pb = ce.encode_many(vb, scale)
        cb = enc.encrypt_many(pb)
        db = dec.decrypt_many(cb)
        breps = max(3, reps // B)
        us[f"encode_b{B}"] = _time_us(
            lambda: ce.encode_many(vb, scale), breps) / B
        us[f"decode_b{B}"] = _time_us(lambda: ce.decode_many(db), breps) / B
        us[f"encrypt_pk_b{B}"] = _time_us(
            lambda: enc.encrypt_many(pb), breps) / B
        us[f"encrypt_sk_b{B}"] = _time_us(
            lambda: enc.encrypt_symmetric_many(pb), breps) / B
        us[f"decrypt_b{B}"] = _time_us(
            lambda: dec.decrypt_many(cb), breps) / B
    L = ctx.first_context_data().coeff_modulus_size
    _emit(n, L, "ckks", "host_api", us)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", nargs="?", default="bfv",
                    choices=["bfv", "bgv", "ckks"])
    ap.add_argument("--batches", type=int, nargs="+", default=[16, 64])
    ap.add_argument("--ns", type=int, nargs="+", default=None)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    if args.mode in ("bfv", "bgv"):
        bgv = args.mode == "bgv"
        for n in (args.ns or [1024, 2048, 4096]):
            if n <= 2048:
                bench_bfv(n, None, 786433, args.batches, bgv)
            else:
                from seal_tpu import PlainModulus

                bench_bfv(n, [36, 36, 37],
                          PlainModulus.batching(n, 20).value,
                          args.batches, bgv)
    else:
        for n in (args.ns or [1024, 2048, 4096]):
            if n <= 2048:
                bench_ckks(n, None, 2.0 ** (10 if n == 1024 else 20),
                           args.batches)
            else:
                bench_ckks(n, [36, 36, 37], 2.0 ** 20, args.batches)


if __name__ == "__main__":
    main()
