"""Batch-amortized host APIs — a TPU-native extension (no reference
counterpart: batchencoder.h / encryptor.h / decryptor.h are scalar-only).

`encode_many / encrypt_many / decrypt_many / decode_many` process a whole
batch of ciphertexts through ONE Python<->native crossing per kernel; the
native side runs batch-lane AVX-512 kernels (8 ciphertexts in the vector
lanes). Results are bit-identical to the scalar calls — the batch forms
are pure throughput.

Typical gains on the host path (BASELINE.md r5 table): 3-4x per op at
small n, turning every encode/encrypt row past the reference's C++.
"""

import time

import numpy as np

from seal_tpu import (
    BatchEncoder, CKKSEncoder, CoeffModulus, Decryptor,
    EncryptionParameters, Encryptor, Evaluator, KeyGenerator, PlainModulus,
    SEALContext, SecLevelType,
)
from seal_tpu.encryption_params import SchemeType


def main(n: int = 4096, B: int = 64):
    parms = EncryptionParameters(SchemeType.BFV)
    parms.set_poly_modulus_degree(n)
    if n >= 4096:
        parms.set_coeff_modulus(CoeffModulus.bfv_default(n))
        parms.set_plain_modulus(PlainModulus.batching(n, 20))
        sec = SecLevelType.TC128
    else:
        # reduced-size smoke (CI): insecure parms with a relin-capable chain
        parms.set_coeff_modulus(CoeffModulus.create(n, [40, 40, 40]))
        parms.set_plain_modulus(PlainModulus.batching(n, 14))
        sec = SecLevelType.NONE
    ctx = SEALContext(parms, sec_level=sec)
    kg = KeyGenerator(ctx)
    enc = Encryptor(ctx, kg.create_public_key(), kg.secret_key())
    dec = Decryptor(ctx, kg.secret_key())
    ev = Evaluator(ctx)
    rk = kg.create_relin_keys()
    be = BatchEncoder(ctx)
    t = int(parms.plain_modulus.value)

    rng = np.random.default_rng(0)
    a = rng.integers(0, 100, size=(B, be.slot_count), dtype=np.int64)
    b = rng.integers(0, 100, size=(B, be.slot_count), dtype=np.int64)

    # one crossing per stage for the whole batch
    t0 = time.perf_counter()
    cts_a = enc.encrypt_many(be.encode_many(a))
    cts_b = enc.encrypt_symmetric_many(be.encode_many(b))
    t_enc = time.perf_counter() - t0
    print(f"encoded+encrypted 2x{B} ciphertexts in {t_enc*1e3:.1f} ms "
          f"({2*B/t_enc:.0f} cts/s host-side)")

    # compute stays the ordinary Evaluator — batch cts are ordinary cts
    prods = [ev.relinearize(ev.multiply(x, y), rk)
             for x, y in zip(cts_a, cts_b)]

    t0 = time.perf_counter()
    outs = be.decode_many(dec.decrypt_many(prods))
    t_dec = time.perf_counter() - t0
    print(f"decrypted+decoded {B} products in {t_dec*1e3:.1f} ms")

    assert np.array_equal(outs, (a * b) % t)
    print(f"all {B} products exact; batch == scalar bit-identity is pinned "
          "by tests/test_batch_api.py")

    # CKKS twin
    cparms = EncryptionParameters(SchemeType.CKKS)
    cparms.set_poly_modulus_degree(n)
    if n >= 4096:
        cparms.set_coeff_modulus(CoeffModulus.create(n, [36, 36, 37]))
        csec = SecLevelType.TC128
    else:
        cparms.set_coeff_modulus(CoeffModulus.create(n, [40, 40, 40]))
        csec = SecLevelType.NONE
    cctx = SEALContext(cparms, sec_level=csec)
    ckg = KeyGenerator(cctx)
    cenc = Encryptor(cctx, ckg.create_public_key())
    cdec = Decryptor(cctx, ckg.secret_key())
    ce = CKKSEncoder(cctx)
    vals = rng.normal(size=(B, ce.slot_count))
    got = ce.decode_many(cdec.decrypt_many(
        cenc.encrypt_many(ce.encode_many(vals, 2.0 ** 30))))
    err = float(np.max(np.abs(got - vals)))
    print(f"CKKS batch roundtrip max err {err:.2e}")
    assert err < 1e-4


if __name__ == "__main__":
    main()
