"""Bit-exactness of the multiparty (threshold) layer against the reference
FORK (keygenerator.cpp:95-518, decryptor.cpp:89-187).

Vectors in tests/vectors/multiparty_bfv_n64.json come from tools/oracle/
dump_multiparty_vectors.cpp: three parties with distinct fixed PRNG seeds
(the factory lives in EncryptionParameters and parms_id does not hash it, so
per-party contexts interoperate — exactly like N real hosts). This pins the
shared-c1 keygen, the CPK/CSK sums, encryption under the common key, every
party's partial decryption, and the aggregation, byte for byte.
"""

import json
import pathlib

import numpy as np
import pytest

from seal_tpu import (
    CoeffModulus,
    Decryptor,
    EncryptionParameters,
    Encryptor,
    KeyGenerator,
    Plaintext,
    SEALContext,
    SchemeType,
    SecLevelType,
)

V = json.loads(
    (pathlib.Path(__file__).parent / "vectors" / "multiparty_bfv_n64.json")
    .read_text()
)
PARTIES = 3


def ref(name):
    return np.array(V[name], dtype=np.uint64)


@pytest.fixture(scope="module")
def mp():
    ctxs, kgs = [], []
    for i in range(PARTIES):
        parms = EncryptionParameters(SchemeType.BFV)
        parms.set_poly_modulus_degree(64)
        parms.set_coeff_modulus(CoeffModulus.create(64, [40, 40, 40]))
        parms.set_plain_modulus(257)
        parms.set_random_seed((10 + i, 2, 3, 4, 5, 6, 7, 8))
        ctxs.append(SEALContext(parms, sec_level=SecLevelType.NONE))
        kgs.append(KeyGenerator(ctxs[-1]))
    sks = [kg.generate_secret_key() for kg in kgs]
    pks = [kgs[0].create_public_key_with_sk(sks[0])]
    for i in range(1, PARTIES):
        pks.append(kgs[i].create_public_key_with_same_c1(sks[i], pks[0]))
    cpk = kgs[0].create_common_public_key(pks)
    csk = kgs[0].create_common_secret_key(sks)
    enc = Encryptor(ctxs[0], cpk)
    ct = enc.encrypt(Plaintext.from_hex_string("2Ax^5 + 6"))
    return dict(ctxs=ctxs, sks=sks, pks=pks, cpk=cpk, csk=csk, ct=ct)


def test_party_secret_keys(mp):
    for i, sk in enumerate(mp["sks"]):
        assert np.array_equal(sk.to_numpy().reshape(-1), ref(f"sk{i}")), i


def test_shared_c1_public_keys(mp):
    for i, pk in enumerate(mp["pks"]):
        arr = pk.data.to_numpy()
        assert np.array_equal(arr[0].reshape(-1), ref(f"pk{i}_c0")), i
        assert np.array_equal(arr[1].reshape(-1), ref(f"pk{i}_c1")), i


def test_common_public_key(mp):
    arr = mp["cpk"].data.to_numpy()
    assert np.array_equal(arr[0].reshape(-1), ref("cpk_c0"))
    assert np.array_equal(arr[1].reshape(-1), ref("cpk_c1"))


def test_common_secret_key(mp):
    assert np.array_equal(mp["csk"].to_numpy().reshape(-1), ref("csk"))


def test_encrypt_under_cpk(mp):
    arr = mp["ct"].to_numpy()
    assert np.array_equal(arr[0].reshape(-1), ref("ct_c0"))
    assert np.array_equal(arr[1].reshape(-1), ref("ct_c1"))


def test_partial_decryptions(mp):
    for i in range(PARTIES):
        part = Decryptor(mp["ctxs"][i], mp["sks"][i]).distributed_decrypt(
            mp["ct"])
        # the fork writes the partial into the ciphertext's second poly
        got = part.to_numpy()[1].reshape(-1)
        assert np.array_equal(got, ref(f"partial{i}")), i


def _gk_all(mp):
    """Per-party Galois keys over get_elts_all (the fork wrappers hard-code
    that list), party 0's kswitch c1s as the CRS, plus the common aggregate."""
    from seal_tpu.dtypes import GaloisKeys
    from seal_tpu.keygenerator import KeyGenerator as KG

    ctxs, sks = mp["ctxs"], mp["sks"]
    kgs = [KG(c) for c in ctxs]
    gt = ctxs[0].key_context_data().galois_tool
    elts = gt.get_elts_all()
    gk0 = kgs[0].create_galois_keys(elts, secret_key=sks[0])
    c1_refs_per_elt = []
    for elt in elts:
        idx = GaloisKeys.get_index(elt)
        k = gk0.keys[idx]
        c1_refs_per_elt.append(
            [(k[0][i, 1], k[1][i, 1]) for i in range(k[0].shape[0])])
    gks = [gk0]
    for i in range(1, PARTIES):
        gks.append(kgs[i].create_galois_keys(
            elts, secret_key=sks[i], c1_refs_per_elt=c1_refs_per_elt))
    common = kgs[0].aggregate_galois_keys(elts, gks)
    return gt, elts, gks, common


@pytest.fixture(scope="module")
def gk(mp):
    return _gk_all(mp)


def _assert_gk(prefix, galois_keys, elts_to_check):
    from seal_tpu.dtypes import GaloisKeys

    for elt in elts_to_check:
        k = galois_keys.keys[GaloisKeys.get_index(elt)]
        lo, hi = np.asarray(k[0], dtype=np.uint64), np.asarray(k[1], dtype=np.uint64)
        arr = lo | (hi << np.uint64(32))          # [decomp, 2, L_key, N]
        for j in range(arr.shape[0]):
            for c in range(2):
                want = ref(f"{prefix}_elt{elt}_k{j}_c{c}")
                assert np.array_equal(arr[j, c].reshape(-1), want), \
                    (prefix, elt, j, c)


def test_party_galois_keys(mp, gk):
    gt, elts, gks, common = gk
    check = [gt.get_elt_from_step(1), 2 * 64 - 1]
    for i in range(PARTIES):
        _assert_gk(f"gk{i}", gks[i], check)


def test_common_galois_keys_bitexact(mp, gk):
    gt, elts, gks, common = gk
    _assert_gk("common_gk", common, [gt.get_elt_from_step(1), 2 * 64 - 1])


def test_threshold_rotation_pipeline(mp, gk):
    """rotate_rows under the common keys, then per-party partials and
    aggregation — the full threshold rotation, byte-compared."""
    from seal_tpu import Evaluator

    gt, elts, gks, common = gk
    ev = Evaluator(mp["ctxs"][0])
    ct_rot = ev.rotate_rows(mp["ct"], 1, common)
    arr = ct_rot.to_numpy()
    assert np.array_equal(arr[0].reshape(-1), ref("ct_rot_c0"))
    assert np.array_equal(arr[1].reshape(-1), ref("ct_rot_c1"))
    partials = [
        Decryptor(mp["ctxs"][i], mp["sks"][i]).distributed_decrypt(ct_rot)
        for i in range(PARTIES)
    ]
    agg = Decryptor(mp["ctxs"][0], mp["sks"][0]).aggregate_partial_decryption(
        ct_rot, partials)
    assert np.array_equal(agg.data, ref("rot_aggregated_plain"))


def test_aggregation_and_csk_decrypt(mp):
    partials = [
        Decryptor(mp["ctxs"][i], mp["sks"][i]).distributed_decrypt(mp["ct"])
        for i in range(PARTIES)
    ]
    agg = Decryptor(mp["ctxs"][0], mp["sks"][0]).aggregate_partial_decryption(
        mp["ct"], partials)
    assert np.array_equal(agg.data, ref("aggregated_plain"))
    assert agg.to_hex_string() == "2Ax^5 + 6"
    direct = Decryptor(mp["ctxs"][0], mp["csk"]).decrypt(mp["ct"])
    assert np.array_equal(direct.data, ref("csk_plain"))
