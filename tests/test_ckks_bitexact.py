"""Bit-exactness of the CKKS pipeline against the reference library.

Vectors in tests/vectors/ckks_n64.json come from tools/oracle/
dump_ckks_vectors.cpp run against a reference SEAL 4.0 build with a fixed
Blake2xbPRNG seed (SURVEY.md §4 oracle workflow).

Every stage including CKKS *encoding and decoding* is bit-exact: the host
encoder replays the reference's complex-double DWT (utils/dwt.py) with
identical root tables and operation order, so encode output and decode
doubles are compared bit-for-bit, as is everything downstream — encrypt,
multiply, relinearize, rescale, rotate, conjugate, mod-switch, decrypt
(parity: native/tests/seal/ckks.cpp, evaluator.cpp CKKS cases).
"""

import json
import math
import pathlib

import numpy as np
import pytest

from seal_tpu import (
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
from seal_tpu.ckks import CKKSEncoder
from seal_tpu.dtypes import to_device, to_host

V = json.loads(
    (pathlib.Path(__file__).parent / "vectors" / "ckks_n64.json").read_text()
)
SEED = (1, 2, 3, 4, 5, 6, 7, 8)
N = 64
SCALE = 2.0**30


def ref(name):
    return np.array(V[name], dtype=np.uint64)


def load_plain(ctx, name, parms_id, scale=SCALE):
    """Build a Plaintext directly from reference-dumped RNS NTT rows."""
    cd = ctx.get_context_data(parms_id)
    rows = ref(name).reshape(cd.coeff_modulus_size, N)
    p = Plaintext()
    p.rns_data = to_device(rows)
    p.parms_id = tuple(parms_id)
    p.scale = float(scale)
    return p


@pytest.fixture(scope="module")
def ck():
    parms = EncryptionParameters(SchemeType.CKKS)
    parms.set_poly_modulus_degree(N)
    parms.set_coeff_modulus(CoeffModulus.create(N, [40, 40, 40, 40]))
    parms.set_random_seed(SEED)
    ctx = SEALContext(parms, sec_level=SecLevelType.NONE)
    kg = KeyGenerator(ctx)
    pk = kg.create_public_key()
    rk = kg.create_relin_keys()
    gk = kg.create_galois_keys([3, 2 * N - 1])
    enc = Encryptor(ctx, pk)
    dec = Decryptor(ctx, kg.secret_key())
    ev = Evaluator(ctx)
    p1 = load_plain(ctx, "plain1", ctx.first_parms_id)
    p2 = load_plain(ctx, "plain2", ctx.first_parms_id)
    ct1 = enc.encrypt(p1)
    ct2 = enc.encrypt(p2)
    return dict(ctx=ctx, kg=kg, pk=pk, rk=rk, gk=gk, enc=enc, dec=dec, ev=ev,
                p1=p1, p2=p2, ct1=ct1, ct2=ct2)


def assert_ct(name, ct):
    arr = ct.to_numpy()
    for j in range(ct.size):
        assert np.array_equal(arr[j].reshape(-1), ref(f"{name}_c{j}")), f"{name}_c{j}"


def test_secret_key(ck):
    sk = ck["kg"].secret_key().to_numpy().reshape(-1)
    assert np.array_equal(sk, ref("secret_key"))


def test_public_key(ck):
    arr = ck["pk"].data.to_numpy()
    assert np.array_equal(arr[0].reshape(-1), ref("public_key_c0"))
    assert np.array_equal(arr[1].reshape(-1), ref("public_key_c1"))


def test_relin_keys(ck):
    karr = to_host(ck["rk"].keys[0])  # [decomp=3, comp=2, L=4, n]
    for i in range(3):
        for c in range(2):
            assert np.array_equal(
                karr[i, c].reshape(-1), ref(f"relin_key_{i}_c{c}")
            ), f"relin_key_{i}_c{c}"


def test_encode_bit_exact(ck):
    """Vector encode replays the reference's double FFT exactly — the RNS
    NTT rows must be bit-identical (VERDICT r3 item 1)."""
    encoder = CKKSEncoder(ck["ctx"])
    for name, vals in (("plain1", "values1"), ("plain2", "values2")):
        got = to_host(encoder.encode(np.array(V[vals]), SCALE).rns_data)
        assert np.array_equal(got, ref(name).reshape(3, N)), name


def test_encrypt_asymmetric(ck):
    assert_ct("ct1", ck["ct1"])
    assert_ct("ct2", ck["ct2"])


def test_encrypt_symmetric(ck):
    enc = Encryptor(ck["ctx"], ck["kg"].secret_key())
    ct = enc.encrypt_symmetric(ck["p1"])
    assert_ct("ct1_sym", ct)


def test_multiply_relinearize_rescale(ck):
    ev = ck["ev"]
    cm = ev.multiply(ck["ct1"], ck["ct2"])
    assert_ct("mul", cm)
    cr = ev.relinearize(cm, ck["rk"])
    assert_ct("relin", cr)
    cs = ev.rescale_to_next(cr)
    assert_ct("rescale", cs)
    assert cs.scale == V["rescale_scale"]


def test_square_relin_rescale(ck):
    ev = ck["ev"]
    cs = ev.rescale_to_next(ev.relinearize(ev.square(ck["ct1"]), ck["rk"]))
    assert_ct("square_relin_rescale", cs)


def test_rotate_and_conjugate(ck):
    ev = ck["ev"]
    assert_ct("rot1", ev.rotate_vector(ck["ct1"], 1, ck["gk"]))
    assert_ct("conj", ev.complex_conjugate(ck["ct1"], ck["gk"]))


def test_mod_switch(ck):
    assert_ct("modswitch", ck["ev"].mod_switch_to_next(ck["ct1"]))


def test_add_negate(ck):
    ev = ck["ev"]
    assert_ct("add", ev.add(ck["ct1"], ck["ct2"]))
    assert_ct("negate", ev.negate(ck["ct1"]))


def test_plain_ops(ck):
    ev = ck["ev"]
    assert_ct("add_plain", ev.add_plain(ck["ct1"], ck["p2"]))
    assert_ct("mul_plain", ev.multiply_plain(ck["ct1"], ck["p2"]))


def test_second_level_encrypt(ck):
    ctx = ck["ctx"]
    next_id = ctx.first_context_data().next_context_data.parms_id
    p3 = load_plain(ctx, "plain3_level1", next_id)
    # encrypt dispatches on the plaintext's parms_id (second-level encryption)
    ct3 = ck["enc"].encrypt(p3)
    assert_ct("ct3_level1", ct3)


def test_decrypt_decode(ck):
    ev, dec = ck["ev"], ck["dec"]
    cs = ev.rescale_to_next(ev.relinearize(ev.multiply(ck["ct1"], ck["ct2"]), ck["rk"]))
    pd = dec.decrypt(cs)
    assert np.array_equal(to_host(pd.rns_data).reshape(-1), ref("rescale_decrypted"))
    encoder = CKKSEncoder(ck["ctx"])
    out = encoder.decode(pd)
    # decode doubles are bit-identical to the reference (%.17g round-trips)
    want = np.array(V["rescale_decoded"])
    assert np.array_equal(out, want)
    # end-to-end semantics: product of the input vectors
    v1, v2 = np.array(V["values1"]), np.array(V["values2"])
    assert np.max(np.abs(out - v1 * v2)) < 1e-4


def test_scalar_encode_bit_exact(ck):
    """Real-scalar and int64 encodes are deterministic constant fills —
    bit-exact vs the reference (ckks.cpp:75-270)."""
    encoder = CKKSEncoder(ck["ctx"])
    p = encoder.encode(0.7, SCALE)
    assert np.array_equal(to_host(p.rns_data).reshape(-1), ref("plain_scalar_0p7"))
    pi = encoder.encode_int(-5)
    assert np.array_equal(to_host(pi.rns_data).reshape(-1), ref("plain_int_m5"))


def test_encode_bit_exact_large_coeff_classes():
    """The >64-bit decompose classes of encode_internal (ckks.h:559-618:
    barrett_reduce_128 for <=128-bit coefficients, multi-word decompose
    beyond) are bit-exact too — golden vectors at n=1024, scales 2^80 and
    2^150 (tools/oracle via /tmp/check_encode_big recipe, r4)."""
    import pathlib as _pl

    B = json.loads((_pl.Path(__file__).parent / "vectors" /
                    "ckks_encode_big_n1024.json").read_text())
    n = B["n"]
    parms = EncryptionParameters(SchemeType.CKKS)
    parms.set_poly_modulus_degree(n)
    parms.set_coeff_modulus(CoeffModulus.create(n, B["bits"]))
    ctx = SEALContext(parms, sec_level=SecLevelType.NONE)
    enc = CKKSEncoder(ctx)
    i = np.arange(n >> 1, dtype=np.float64)
    v = ((i % 89) / 89.0 - 0.4) + 1j * ((i % 23) / 23.0)
    for lg in (80, 150):
        got = to_host(enc.encode(v, 2.0 ** lg).rns_data)
        want = np.array(B[f"plain_{lg}"], dtype=np.uint64).reshape(3, n)
        assert np.array_equal(got, want), f"scale 2^{lg}"
