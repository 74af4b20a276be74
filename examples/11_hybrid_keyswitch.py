"""Hybrid key switching (seal_tpu extension — no reference analogue).

The reference implements one key-switching variant: a single special prime
with per-prime decomposition (evaluator.cpp:2382-2677). seal_tpu adds the
GHS-style hybrid scheme every modern HE library ships (OpenFHE, Lattigo):
`set_special_modulus_size(alpha)` reserves alpha special primes and
decomposes into ceil(L/alpha) digits, cutting the decompose NTTs — the
dominant cost of relinearize/rotate — roughly alpha-fold.

This example runs the SAME CKKS workload under alpha=1 (the reference
algorithm) and alpha=2 at an equal total-modulus budget, plus the fused
relinearize+rescale fast path (one mod-down by P*q_last instead of two,
docs/HYBRID_KEYSWITCH.md "Fused rescale"), and checks all three decrypt
to the same values.
"""

import numpy as np

from seal_tpu import (
    CKKSEncoder, CoeffModulus, Decryptor, EncryptionParameters, Encryptor,
    Evaluator, KeyGenerator, SEALContext, SecLevelType,
)
from seal_tpu.encryption_params import SchemeType


def run(n, bits, alpha, vals, scale, fused=False):
    parms = EncryptionParameters(SchemeType.CKKS)
    parms.set_poly_modulus_degree(n)
    parms.set_coeff_modulus(CoeffModulus.create(n, bits))
    parms.set_special_modulus_size(alpha)
    context = SEALContext(parms, sec_level=SecLevelType.NONE)
    keygen = KeyGenerator(context)
    encryptor = Encryptor(context, keygen.create_public_key())
    decryptor = Decryptor(context, keygen.secret_key())
    evaluator = Evaluator(context)
    encoder = CKKSEncoder(context)
    rk = keygen.create_relin_keys()
    gk = keygen.create_galois_keys(
        context.key_context_data().galois_tool.get_elts_from_steps([1]))

    digits = rk.key(2)[0].shape[0]
    print(f"alpha={alpha}: {context.first_context_data().coeff_modulus_size} "
          f"data primes, {digits} keyswitch digit(s), key tensor "
          f"{tuple(rk.key(2)[0].shape)}")

    ct = encryptor.encrypt(encoder.encode(vals, scale))
    if fused:
        # ONE mod-down by P*q_last (docs/HYBRID_KEYSWITCH.md "Fused rescale")
        out = evaluator.relinearize_rescale(evaluator.multiply(ct, ct), rk)
    else:
        out = evaluator.rescale_to_next(
            evaluator.relinearize(evaluator.multiply(ct, ct), rk))
    out = evaluator.rotate_vector(out, 1, gk)
    return encoder.decode(decryptor.decrypt(out))


def main(n: int = 256):
    scale = 2.0 ** 40
    # equal depth (4 data primes), equal total budget:
    #   alpha=1: 4 data + 1 special;  alpha=2: 4 data + 2 specials
    bits1 = [50, 40, 40, 40, 50]
    bits2 = [50, 40, 40, 40, 50, 50]
    vals = np.linspace(-1, 1, n // 2)
    want = np.roll(vals ** 2, -1)

    got1 = run(n, bits1, 1, vals, scale)
    got2 = run(n, bits2, 2, vals, scale)
    got3 = run(n, bits2, 2, vals, scale, fused=True)
    e1 = np.max(np.abs(got1 - want))
    e2 = np.max(np.abs(got2 - want))
    e3 = np.max(np.abs(got3 - want))
    print(f"mult+relin+rescale+rotate error: alpha=1 {e1:.2e}, "
          f"alpha=2 {e2:.2e}, alpha=2 fused {e3:.2e}")
    assert e1 < 1e-5 and e2 < 1e-5 and e3 < 1e-5
    print("hybrid, fused, and reference key switching agree.")


if __name__ == "__main__":
    main()
