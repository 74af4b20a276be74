"""Performance walkthrough: per-op timings down the modulus chain
(parity: native/examples/8_performance.cpp). Jitted pipelines; run with the
TPU backend for real numbers (CPU is an emulation path)."""

import time

import jax
import numpy as np

from seal_tpu import (
    BatchEncoder, CoeffModulus, Decryptor, EncryptionParameters, Encryptor,
    Evaluator, KeyGenerator, PlainModulus, SEALContext,
)
from seal_tpu.encryption_params import SchemeType
from seal_tpu.ckks import CKKSEncoder


def time_op(label, fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out))
    dt = (time.perf_counter() - t0) / reps
    print(f"  {label:<28s} {dt*1e6:10.0f} us")
    return out


def bfv_performance(n=4096):
    print(f"BFV performance, n={n}:")
    from seal_tpu import SecLevelType

    parms = EncryptionParameters(SchemeType.BFV)
    parms.set_poly_modulus_degree(n)
    parms.set_coeff_modulus(CoeffModulus.bfv_default(n) if n >= 1024
                            else CoeffModulus.create(n, [30, 30, 31]))
    parms.set_plain_modulus(PlainModulus.batching(n, 20))
    context = SEALContext(
        parms, sec_level=(SecLevelType.TC128 if n >= 1024
                          else SecLevelType.NONE))
    t0 = time.perf_counter()
    keygen = KeyGenerator(context)
    pk = keygen.create_public_key()
    rk = keygen.create_relin_keys()
    print(f"  {'keygen (sk+pk+relin)':<28s} {(time.perf_counter()-t0)*1e6:10.0f} us")
    encryptor = Encryptor(context, pk)
    evaluator = Evaluator(context)
    decryptor = Decryptor(context, keygen.secret_key())
    encoder = BatchEncoder(context)

    vals = list(range(encoder.slot_count))
    plain = encoder.encode(vals)
    ct1 = encryptor.encrypt(plain)
    ct2 = encryptor.encrypt(encoder.encode(vals[::-1]))

    time_op("encode", encoder.encode, vals)
    time_op("encrypt", encryptor.encrypt, plain)
    time_op("decrypt", decryptor.decrypt, ct1)
    time_op("add", jax.jit(evaluator.add), ct1, ct2)
    mul = jax.jit(lambda a, b: evaluator.relinearize(evaluator.multiply(a, b), rk))
    time_op("multiply+relinearize", mul, ct1, ct2)


def ckks_performance(n=8192):
    print(f"CKKS performance, n={n}:")
    from seal_tpu import SecLevelType

    parms = EncryptionParameters(SchemeType.CKKS)
    parms.set_poly_modulus_degree(n)
    bits = [50, 40, 40, 50] if n >= 8192 else [30, 20, 30]
    scale_bits = 40 if n >= 8192 else 20
    parms.set_coeff_modulus(CoeffModulus.create(n, bits))
    context = SEALContext(
        parms, sec_level=(SecLevelType.TC128 if n >= 8192
                          else SecLevelType.NONE))
    keygen = KeyGenerator(context)
    pk = keygen.create_public_key()
    rk = keygen.create_relin_keys()
    encryptor = Encryptor(context, pk)
    evaluator = Evaluator(context)
    decryptor = Decryptor(context, keygen.secret_key())
    encoder = CKKSEncoder(context)

    scale = 2.0 ** scale_bits
    vals = np.linspace(-1, 1, encoder.slot_count)
    plain = encoder.encode(vals, scale)
    ct1 = encryptor.encrypt(plain)
    ct2 = encryptor.encrypt(encoder.encode(vals[::-1], scale))

    time_op("encode", encoder.encode, vals, scale)
    time_op("encrypt", encryptor.encrypt, plain)
    pipeline = jax.jit(
        lambda a, b: evaluator.rescale_to_next(
            evaluator.relinearize(evaluator.multiply(a, b), rk)))
    time_op("multiply+relin+rescale", pipeline, ct1, ct2)


def main(n_bfv: int = 4096, n_ckks: int = 8192):
    bfv_performance(n_bfv)
    ckks_performance(n_ckks)
    print("8_performance OK")


if __name__ == "__main__":
    main()
