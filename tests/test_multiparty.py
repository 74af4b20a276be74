"""Multiparty (threshold) HE flows — the fork's added surface
(SURVEY.md §2.12; example flow native/examples/1_bfv_basics.cpp:160-215).

Covers: per-party secret keys, public keys sharing a common c1, common
public/secret keys as sums, encryption under the common key, distributed
partial decryption + aggregation (with and without smudging noise), and
common Galois keys aggregated from per-party shares."""

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


@pytest.fixture(scope="module")
def mp():
    parms = EncryptionParameters(SchemeType.BFV)
    parms.set_poly_modulus_degree(64)
    parms.set_coeff_modulus(CoeffModulus.create(64, [40, 40, 40]))
    parms.set_plain_modulus(257)
    ctx = SEALContext(parms, sec_level=SecLevelType.NONE)
    kg = KeyGenerator(ctx)
    parties = 3
    sks = [kg.generate_secret_key() for _ in range(parties)]
    pks = [kg.create_public_key_with_sk(sks[0])]
    for i in range(1, parties):
        pks.append(kg.create_public_key_with_same_c1(sks[i], pks[0]))
    cpk = kg.create_common_public_key(pks)
    csk = kg.create_common_secret_key(sks)
    return dict(ctx=ctx, kg=kg, sks=sks, pks=pks, cpk=cpk, csk=csk)


def test_shared_c1(mp):
    c1_ref = mp["pks"][0].data.to_numpy()[1]
    for pk in mp["pks"][1:]:
        assert np.array_equal(pk.data.to_numpy()[1], c1_ref)


def test_common_secret_key_is_sum(mp):
    ctx = mp["ctx"]
    moduli = [m.value for m in ctx.key_context_data().parms.coeff_modulus]
    total = np.zeros_like(mp["sks"][0].to_numpy())
    acc = total.astype(object)
    for sk in mp["sks"]:
        acc = acc + sk.to_numpy().astype(object)
    csk = mp["csk"].to_numpy().astype(object)
    for j, q in enumerate(moduli):
        assert np.array_equal(csk[j] % q, acc[j] % q)


def test_common_key_encrypt_decrypt(mp):
    """Encrypt under CPK, decrypt with CSK directly."""
    enc = Encryptor(mp["ctx"], mp["cpk"])
    dec = Decryptor(mp["ctx"], mp["csk"])
    p = Plaintext.from_hex_string("6")
    ct = enc.encrypt(p)
    assert dec.decrypt(ct).to_hex_string() == "6"
    assert dec.invariant_noise_budget(ct) > 0


def test_distributed_decrypt(mp):
    """Party-local partials aggregate to the plaintext (the fork's
    distributed_decrypt + aggregate_partial_decryption, any party count)."""
    enc = Encryptor(mp["ctx"], mp["cpk"])
    p = Plaintext.from_hex_string("2Ax^5 + 6")
    ct = enc.encrypt(p)
    partials = [
        Decryptor(mp["ctx"], sk).distributed_decrypt(ct) for sk in mp["sks"]
    ]
    agg = Decryptor(mp["ctx"], mp["sks"][0]).aggregate_partial_decryption(ct, partials)
    assert agg.to_hex_string() == "2Ax^5 + 6"


def test_distributed_decrypt_with_smudging(mp):
    """Smudging noise (the security fix the fork lacks) must not break
    correctness at moderate magnitude."""
    enc = Encryptor(mp["ctx"], mp["cpk"])
    p = Plaintext.from_hex_string("7")
    ct = enc.encrypt(p)
    partials = [
        Decryptor(mp["ctx"], sk).distributed_decrypt(ct, smudging_bits=10)
        for sk in mp["sks"]
    ]
    agg = Decryptor(mp["ctx"], mp["sks"][0]).aggregate_partial_decryption(ct, partials)
    assert agg.to_hex_string() == "7"


def test_homomorphic_op_then_distributed_decrypt(mp):
    enc = Encryptor(mp["ctx"], mp["cpk"])
    ev = Evaluator(mp["ctx"])
    a = enc.encrypt(Plaintext.from_hex_string("5"))
    b = enc.encrypt(Plaintext.from_hex_string("3"))
    s = ev.add(a, b)
    partials = [Decryptor(mp["ctx"], sk).distributed_decrypt(s) for sk in mp["sks"]]
    agg = Decryptor(mp["ctx"], mp["sks"][0]).aggregate_partial_decryption(s, partials)
    assert agg.to_hex_string() == "8"


def test_common_galois_keys(mp):
    """Per-party rotation-key shares with a common CRS aggregate into
    working common rotation keys (fork's gen_common_galois_keys)."""
    ctx, kg = mp["ctx"], mp["kg"]
    gt = ctx.key_context_data().galois_tool
    elts = [gt.get_elt_from_step(1)]
    # party 0 generates with its sk; its kswitch c1s become the CRS
    gk0 = kg.create_galois_keys(elts, secret_key=mp["sks"][0])
    from seal_tpu.dtypes import GaloisKeys

    idx = GaloisKeys.get_index(elts[0])
    c1_refs = [
        (gk0.keys[idx][0][i, 1], gk0.keys[idx][1][i, 1])
        for i in range(gk0.keys[idx][0].shape[0])
    ]
    shares = [gk0]
    for sk in mp["sks"][1:]:
        shares.append(
            kg.create_galois_keys(elts, secret_key=sk, c1_refs_per_elt=[c1_refs])
        )
    common = kg.aggregate_galois_keys(elts, shares)

    enc = Encryptor(ctx, mp["cpk"])
    be = BatchEncoder(ctx)
    ev = Evaluator(ctx)
    vals = list(range(64))
    ct = enc.encrypt(be.encode(vals))
    rot = ev.rotate_rows(ct, 1, common)
    partials = [Decryptor(ctx, sk).distributed_decrypt(rot) for sk in mp["sks"]]
    agg = Decryptor(ctx, mp["sks"][0]).aggregate_partial_decryption(rot, partials)
    got = be.decode(agg)
    r1, r2 = vals[:32], vals[32:]
    assert np.array_equal(got, r1[1:] + r1[:1] + r2[1:] + r2[:1])


def test_five_party_flow():
    """Party count is NOT hardcoded (the reference fork loops exactly 3
    parties, decryptor.cpp:108): a full 5-party CPK encrypt ->
    distributed-decrypt flow."""
    parms = EncryptionParameters(SchemeType.BFV)
    parms.set_poly_modulus_degree(64)
    parms.set_coeff_modulus(CoeffModulus.create(64, [40, 40, 40]))
    parms.set_plain_modulus(257)
    ctx = SEALContext(parms, sec_level=SecLevelType.NONE)
    kg = KeyGenerator(ctx)
    parties = 5
    sks = [kg.generate_secret_key() for _ in range(parties)]
    pks = [kg.create_public_key_with_sk(sks[0])]
    for i in range(1, parties):
        pks.append(kg.create_public_key_with_same_c1(sks[i], pks[0]))
    cpk = kg.create_common_public_key(pks)
    csk = kg.create_common_secret_key(sks)

    enc = Encryptor(ctx, cpk)
    ct = enc.encrypt(Plaintext.from_hex_string("3x^2 + 9"))
    # joint secret key decrypts directly
    assert Decryptor(ctx, csk).decrypt(ct).to_hex_string() == "3x^2 + 9"
    # and the 5 per-party partials aggregate to the same plaintext
    partials = [Decryptor(ctx, sk).distributed_decrypt(ct) for sk in sks]
    agg = Decryptor(ctx, sks[0]).aggregate_partial_decryption(ct, partials)
    assert agg.to_hex_string() == "3x^2 + 9"


def test_bgv_threshold_decrypt_with_correction_factor():
    """BGV threshold decryption must undo the tracked correction factor
    exactly like the direct _bgv_decrypt (regression: the aggregate path
    used to skip the inverse, so any mod-switched/multiplied BGV ciphertext
    threshold-decrypted to a scaled plaintext)."""
    parms = EncryptionParameters(SchemeType.BGV)
    parms.set_poly_modulus_degree(64)
    parms.set_coeff_modulus(CoeffModulus.create(64, [40, 40, 40]))
    parms.set_plain_modulus(257)
    parms.set_random_seed((1, 2, 3, 4, 5, 6, 7, 8))
    ctx = SEALContext(parms, sec_level=SecLevelType.NONE)
    kg = KeyGenerator(ctx)
    parties = 3
    sks = [kg.generate_secret_key() for _ in range(parties)]
    pks = [kg.create_public_key_with_sk(sks[0])]
    for i in range(1, parties):
        pks.append(kg.create_public_key_with_same_c1(sks[i], pks[0]))
    cpk = kg.create_common_public_key(pks)
    enc = Encryptor(ctx, cpk)
    ev = Evaluator(ctx)
    ct = ev.mod_switch_to_next(enc.encrypt(Plaintext.from_hex_string("5x^2 + 3")))
    assert ct.correction_factor != 1
    # direct decrypt under the common secret key
    csk = kg.create_common_secret_key(sks)
    assert Decryptor(ctx, csk).decrypt(ct).to_hex_string() == "5x^2 + 3"
    # threshold decrypt must agree
    partials = [Decryptor(ctx, sk).distributed_decrypt(ct) for sk in sks]
    agg = Decryptor(ctx, sks[0]).aggregate_partial_decryption(ct, partials)
    assert agg.to_hex_string() == "5x^2 + 3"


def test_partial_decryptions_roundtrip_the_wire(mp):
    """Real threshold deployments exchange partial decryptions between
    hosts: each party's partial must survive the SEAL wire format and
    aggregate identically after loading."""
    from seal_tpu import serialization as ser

    enc = Encryptor(mp["ctx"], mp["cpk"])
    ct = enc.encrypt(Plaintext.from_hex_string("2Ax^5 + 6"))
    loaded = []
    for sk in mp["sks"]:
        part = Decryptor(mp["ctx"], sk).distributed_decrypt(ct)
        loaded.append(ser.load_ciphertext(mp["ctx"], ser.save_ciphertext(part)))
    agg = Decryptor(mp["ctx"], mp["sks"][0]).aggregate_partial_decryption(ct, loaded)
    assert agg.to_hex_string() == "2Ax^5 + 6"
