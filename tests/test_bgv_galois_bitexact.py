"""BGV pipeline and BFV Galois/rotation bit-exactness vs the reference
(vectors from tools/oracle/dump_bgv_galois_vectors.cpp)."""

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
    (pathlib.Path(__file__).parent / "vectors" / "bgv_galois_n64.json").read_text()
)
SEED = (1, 2, 3, 4, 5, 6, 7, 8)


def ref(name):
    return np.array(V[name], dtype=np.uint64)


def assert_ct(name, ct):
    arr = ct.to_numpy()
    for j in range(ct.size):
        assert np.array_equal(arr[j].reshape(-1), ref(f"{name}_c{j}")), f"{name}_c{j}"


def make_parms(scheme):
    parms = EncryptionParameters(scheme)
    parms.set_poly_modulus_degree(64)
    parms.set_coeff_modulus(CoeffModulus.create(64, [40, 40, 40]))
    parms.set_plain_modulus(257)
    parms.set_random_seed(SEED)
    return parms


@pytest.fixture(scope="module")
def bgv():
    ctx = SEALContext(make_parms(SchemeType.BGV), sec_level=SecLevelType.NONE)
    kg = KeyGenerator(ctx)
    pk = kg.create_public_key()
    rk = kg.create_relin_keys()
    return dict(ctx=ctx, kg=kg, pk=pk, rk=rk,
                enc=Encryptor(ctx, pk), dec=Decryptor(ctx, kg.secret_key()),
                ev=Evaluator(ctx))


def test_bgv_keys(bgv):
    sk = bgv["kg"].secret_key().to_numpy().reshape(-1)
    assert np.array_equal(sk, ref("bgv_secret_key"))
    assert_ct("bgv_public_key", bgv["pk"].data)


def test_bgv_pipeline(bgv):
    enc, dec, ev, rk = bgv["enc"], bgv["dec"], bgv["ev"], bgv["rk"]
    c1 = enc.encrypt(Plaintext.from_hex_string("5x^3 + 2x^1 + 3"))
    assert_ct("bgv_ct1", c1)
    c2 = enc.encrypt(Plaintext.from_hex_string("1x^2 + 4"))
    cm = ev.multiply(c1, c2)
    assert_ct("bgv_mul", cm)
    assert cm.correction_factor == V["bgv_mul_correction"]
    cr = ev.relinearize(cm, rk)
    assert_ct("bgv_relin", cr)
    cs = ev.mod_switch_to_next(cr)
    assert_ct("bgv_modswitch", cs)
    assert cs.correction_factor == V["bgv_modswitch_correction"]
    assert dec.decrypt(cs).to_hex_string() == V["bgv_modswitch_decrypted"]
    ca = ev.add(c1, c2)
    assert_ct("bgv_add", ca)

    # deeper chain (VERDICT r1 item 3): multiply AGAIN at level 1 and
    # relinearize — exercises BGV correction-factor tracking across levels
    cs2 = ev.mod_switch_to_next(c2)
    cm2 = ev.multiply(cs, cs2)
    assert_ct("bgv_mul_level1", cm2)
    assert cm2.correction_factor == V["bgv_mul_level1_correction"]
    cb = ev.relinearize(cm2, rk)
    assert_ct("bgv_chain_bottom", cb)
    assert cb.correction_factor == V["bgv_chain_bottom_correction"]
    assert dec.decrypt(cb).to_hex_string() == V["bgv_chain_bottom_decrypted"]


@pytest.fixture(scope="module")
def bfv_rot():
    ctx = SEALContext(make_parms(SchemeType.BFV), sec_level=SecLevelType.NONE)
    kg = KeyGenerator(ctx)
    pk = kg.create_public_key()
    gk = kg.create_galois_keys([3, 9, 27, 127])
    return dict(ctx=ctx, kg=kg, pk=pk, gk=gk,
                enc=Encryptor(ctx, pk), dec=Decryptor(ctx, kg.secret_key()),
                ev=Evaluator(ctx), be=BatchEncoder(ctx))


def test_galois_keys_bitexact(bfv_rot):
    from seal_tpu.dtypes import to_host
    from seal_tpu.dtypes import GaloisKeys

    karr = to_host(bfv_rot["gk"].key(3))
    for i in range(karr.shape[0]):
        for c in range(2):
            assert np.array_equal(karr[i, c].reshape(-1), ref(f"galois3_{i}_c{c}"))


def test_rotation_bitexact(bfv_rot):
    ev, enc, be = bfv_rot["ev"], bfv_rot["enc"], bfv_rot["be"]
    ct = enc.encrypt(be.encode(list(range(64))))
    rot = ev.rotate_rows(ct, 3, bfv_rot["gk"])
    assert_ct("bfv_rot3", rot)
    gal = ev.apply_galois(ct, 9, bfv_rot["gk"])
    assert_ct("bfv_galois9", gal)


def test_rotation_semantics(bfv_rot):
    ev, enc, dec, be = bfv_rot["ev"], bfv_rot["enc"], bfv_rot["dec"], bfv_rot["be"]
    vals = list(range(64))
    ct = enc.encrypt(be.encode(vals))
    got = be.decode(dec.decrypt(ev.rotate_rows(ct, 3, bfv_rot["gk"])))
    r1, r2 = vals[:32], vals[32:]
    assert np.array_equal(got, r1[3:] + r1[:3] + r2[3:] + r2[:3])
    got = be.decode(dec.decrypt(ev.rotate_columns(ct, bfv_rot["gk"])))
    assert np.array_equal(got, r2 + r1)
