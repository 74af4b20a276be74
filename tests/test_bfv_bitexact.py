"""Bit-exactness of the full BFV pipeline against the reference library.

Vectors in tests/vectors/bfv_n64.json come from tools/oracle/
dump_bfv_vectors.cpp run against a build of the reference SEAL 4.0 with a
fixed Blake2xbPRNG seed — the definitive end-to-end oracle (SURVEY.md §4:
"generate cross-implementation vectors by running reference sealtest/
examples with fixed Blake2xbPRNGFactory(seed)").
"""

import json
import pathlib

import numpy as np
import pytest

from seal_tpu import (
    BatchEncoder,
    CoeffModulus,
    Decryptor,
    EncryptionParameters,
    Encryptor,
    Evaluator,
    KeyGenerator,
    Plaintext,
    SEALContext,
    SchemeType,
    SecLevelType,
)

V = json.loads(
    (pathlib.Path(__file__).parent / "vectors" / "bfv_n64.json").read_text()
)
SEED = (1, 2, 3, 4, 5, 6, 7, 8)


def ref(name):
    return np.array(V[name], dtype=np.uint64)


@pytest.fixture(scope="module")
def bfv():
    parms = EncryptionParameters(SchemeType.BFV)
    parms.set_poly_modulus_degree(64)
    parms.set_coeff_modulus(CoeffModulus.create(64, [40, 40, 40]))
    parms.set_plain_modulus(257)
    parms.set_random_seed(SEED)
    ctx = SEALContext(parms, sec_level=SecLevelType.NONE)
    kg = KeyGenerator(ctx)
    pk = kg.create_public_key()
    rk = kg.create_relin_keys()
    enc = Encryptor(ctx, pk)
    dec = Decryptor(ctx, kg.secret_key())
    ev = Evaluator(ctx)
    p1 = Plaintext.from_hex_string("5x^3 + 2x^1 + 3")
    p2 = Plaintext.from_hex_string("1x^63 + 4x^2 + 1")
    ct1 = enc.encrypt(p1)
    ct2 = enc.encrypt(p2)
    return dict(ctx=ctx, kg=kg, pk=pk, rk=rk, enc=enc, dec=dec, ev=ev,
                p1=p1, p2=p2, ct1=ct1, ct2=ct2)


def assert_ct(name, ct):
    arr = ct.to_numpy()
    for j in range(ct.size):
        assert np.array_equal(arr[j].reshape(-1), ref(f"{name}_c{j}")), f"{name}_c{j}"


def test_secret_key(bfv):
    sk = bfv["kg"].secret_key().to_numpy().reshape(-1)
    assert np.array_equal(sk, ref("secret_key"))


def test_public_key(bfv):
    arr = bfv["pk"].data.to_numpy()
    assert np.array_equal(arr[0].reshape(-1), ref("public_key_c0"))
    assert np.array_equal(arr[1].reshape(-1), ref("public_key_c1"))


def test_relin_keys(bfv):
    from seal_tpu.dtypes import to_host

    karr = to_host(bfv["rk"].keys[0])  # [decomp=2, comp=2, L=3, n]
    for i in range(2):
        for c in range(2):
            assert np.array_equal(karr[i, c].reshape(-1), ref(f"relin0_{i}_c{c}"))


def test_encrypt_asymmetric(bfv):
    assert_ct("ct1", bfv["ct1"])
    assert_ct("ct2", bfv["ct2"])


def test_encrypt_symmetric(bfv):
    enc = Encryptor(bfv["ctx"], bfv["kg"].secret_key())
    ct = enc.encrypt_symmetric(bfv["p1"])
    assert_ct("ct_sym", ct)


def test_add_negate(bfv):
    ev = bfv["ev"]
    assert_ct("ct_add", ev.add(bfv["ct1"], bfv["ct2"]))
    assert_ct("ct_neg", ev.negate(bfv["ct1"]))


def test_multiply_relinearize_modswitch(bfv):
    ev, dec = bfv["ev"], bfv["dec"]
    ct_mul = ev.multiply(bfv["ct1"], bfv["ct2"])
    assert_ct("ct_mul", ct_mul)
    assert dec.decrypt(ct_mul).to_hex_string() == V["mul_decrypted"]
    assert dec.invariant_noise_budget(ct_mul) == V["noise_budget_mul"]

    ct_relin = ev.relinearize(ct_mul, bfv["rk"])
    assert_ct("ct_relin", ct_relin)
    assert dec.decrypt(ct_relin).to_hex_string() == V["relin_decrypted"]

    ct_ms = ev.mod_switch_to_next(ct_relin)
    assert_ct("ct_modswitch", ct_ms)
    assert dec.decrypt(ct_ms).to_hex_string() == V["modswitch_decrypted"]


def test_noise_budget(bfv):
    assert bfv["dec"].invariant_noise_budget(bfv["ct1"]) == V["noise_budget_ct1"]


def test_plain_ops(bfv):
    ev = bfv["ev"]
    assert_ct("ct_add_plain", ev.add_plain(bfv["ct1"], bfv["p2"]))
    assert_ct("ct_mul_plain", ev.multiply_plain(bfv["ct1"], bfv["p2"]))


def test_batch_encode(bfv):
    be = BatchEncoder(bfv["ctx"])
    vals = [(i * 7 + 1) % 257 for i in range(64)]
    p = be.encode(vals)
    assert np.array_equal(p.data, ref("batch_encoded"))
    assert np.array_equal(be.decode(p), vals)


def test_sub_roundtrip(bfv):
    """sub has no oracle row; verify semantically."""
    ev, dec = bfv["ev"], bfv["dec"]
    ct = ev.sub(bfv["ct1"], bfv["ct2"])
    got = dec.decrypt(ct)
    # (5x^3+2x+3) - (x^63+4x^2+1) mod 257
    expect = {3: 5, 1: 2, 0: 2, 63: 257 - 1, 2: 257 - 4}
    data = np.zeros(64, dtype=np.uint64)
    for e, c in expect.items():
        data[e] = c
    full = np.zeros(64, dtype=np.uint64)
    full[: len(got.data)] = got.data
    assert np.array_equal(full, data)


def test_square_and_multiply_many(bfv):
    ev, dec = bfv["ev"], bfv["dec"]
    sq = ev.relinearize(ev.square(bfv["ct1"]), bfv["rk"])
    # (5x^3+2x+3)^2 = 25x^6 + 20x^4 + 30x^3 + 4x^2 + 12x + 9
    got = dec.decrypt(sq).to_hex_string()
    assert got == "19x^6 + 14x^4 + 1Ex^3 + 4x^2 + Cx^1 + 9"
