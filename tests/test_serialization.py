"""SEAL wire-format interop: byte-level against reference serializations
(vectors from tools/oracle/dump_serialization_vectors.cpp)."""

import io
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
from seal_tpu import serialization as ser

V = json.loads(
    (pathlib.Path(__file__).parent / "vectors" / "serialization_n64.json").read_text()
)
SEED = (1, 2, 3, 4, 5, 6, 7, 8)


def vec(name) -> bytes:
    return bytes.fromhex(V[name])


@pytest.fixture(scope="module")
def ctx():
    parms = EncryptionParameters(SchemeType.BFV)
    parms.set_poly_modulus_degree(64)
    parms.set_coeff_modulus(CoeffModulus.create(64, [40, 40, 40]))
    parms.set_plain_modulus(257)
    parms.set_random_seed(SEED)
    return SEALContext(parms, sec_level=SecLevelType.NONE)


@pytest.fixture(scope="module")
def keys(ctx):
    kg = KeyGenerator(ctx)
    return kg, kg.create_public_key(), kg.create_relin_keys()


def test_parms_roundtrip_and_bytes(ctx):
    parms = ctx.key_context_data().parms
    mine = ser.save_encryption_parameters(parms)
    assert mine == vec("parms")
    loaded = ser.load_encryption_parameters(vec("parms"))
    assert loaded.parms_id == parms.parms_id


def test_secret_key_bytes(ctx, keys):
    kg, _, _ = keys
    mine = ser.save_secret_key(kg.secret_key())
    assert mine == vec("secret_key")
    loaded = ser.load_secret_key(ctx, vec("secret_key"))
    assert np.array_equal(loaded.to_numpy(), kg.secret_key().to_numpy())


def test_public_key_bytes(ctx, keys):
    _, pk, _ = keys
    assert ser.save_public_key(pk) == vec("public_key")
    loaded = ser.load_public_key(ctx, vec("public_key"))
    assert np.array_equal(loaded.data.to_numpy(), pk.data.to_numpy())


def test_relin_keys_bytes(ctx, keys):
    _, _, rk = keys
    assert ser.save_relin_keys(rk) == vec("relin_keys")
    loaded = ser.load_relin_keys(ctx, vec("relin_keys"))
    from seal_tpu.dtypes import to_host

    assert np.array_equal(to_host(loaded.keys[0]), to_host(rk.keys[0]))


def test_plaintext_bytes(ctx):
    p = Plaintext.from_hex_string("5x^3 + 2x^1 + 3")
    assert ser.save_plaintext(p) == vec("plain1")
    loaded = ser.load_plaintext(ctx, vec("plain1"))
    assert loaded == p


def test_ciphertext_bytes(ctx, keys):
    kg, pk, _ = keys
    enc = Encryptor(ctx, pk)
    ct = enc.encrypt(Plaintext.from_hex_string("5x^3 + 2x^1 + 3"))
    assert ser.save_ciphertext(ct) == vec("ct1")
    loaded = ser.load_ciphertext(ctx, vec("ct1"))
    assert np.array_equal(loaded.to_numpy(), ct.to_numpy())
    assert loaded.scale == ct.scale and loaded.correction_factor == ct.correction_factor


def test_seeded_ciphertext_interop(ctx, keys):
    """A reference seed-compressed symmetric ciphertext must expand here and
    decrypt correctly (serializable.h / rlwe.cpp:405-412 seed-in-c1)."""
    kg, _, _ = keys
    loaded = ser.load_ciphertext(ctx, vec("ct_sym_seeded"))
    dec = Decryptor(ctx, kg.secret_key())
    assert dec.decrypt(loaded).to_hex_string() == "5x^3 + 2x^1 + 3"
    # and my own seeded save must byte-match the reference's
    enc = Encryptor(ctx, kg.secret_key())
    ct_sym = enc.encrypt_symmetric(Plaintext.from_hex_string("5x^3 + 2x^1 + 3"),
                                   save_seed=True)
    assert ser.save_ciphertext(ct_sym) == vec("ct_sym_seeded")


def test_compressed_roundtrip(ctx, keys):
    kg, pk, _ = keys
    enc = Encryptor(ctx, pk)
    ct = enc.encrypt(Plaintext.from_hex_string("7x^10 + 1"))
    blob = ser.save_ciphertext(ct, ser.ComprMode.ZLIB)
    assert len(blob) < len(ser.save_ciphertext(ct))
    loaded = ser.load_ciphertext(ctx, blob)
    assert np.array_equal(loaded.to_numpy(), ct.to_numpy())


def test_header_validation(ctx):
    with pytest.raises(ValueError):
        ser.load_ciphertext(ctx, b"\x00" * 32)
    good = bytearray(vec("plain1"))
    good[0] ^= 0xFF  # corrupt magic
    with pytest.raises(ValueError):
        ser.load_plaintext(ctx, bytes(good))


def test_galois_keys_roundtrip_and_rotation(ctx, keys):
    """GaloisKeys through the wire format: a loaded key set must produce
    the same rotation ciphertext as the in-memory one (exact)."""
    from seal_tpu import BatchEncoder, Evaluator

    kg, pk, _ = keys
    gt = ctx.key_context_data().galois_tool
    gk = kg.create_galois_keys(gt.get_elts_from_steps([1, -1]))
    blob = ser.save_galois_keys(gk)
    gk2 = ser.load_galois_keys(ctx, blob)
    assert gk2.parms_id == gk.parms_id
    assert len(gk2.keys) == len(gk.keys)

    enc = Encryptor(ctx, pk)
    ev = Evaluator(ctx)
    be = BatchEncoder(ctx)
    ct = enc.encrypt(be.encode([v % 257 for v in range(be.slot_count)]))
    a = ev.rotate_rows(ct, 1, gk)
    b = ev.rotate_rows(ct, 1, gk2)
    np.testing.assert_array_equal(np.asarray(a.data[0]), np.asarray(b.data[0]))
    np.testing.assert_array_equal(np.asarray(a.data[1]), np.asarray(b.data[1]))


def test_legacy_34_header_recognized():
    """LoadHeader(try_upgrade_if_invalid) parity (serialization.h:212): a
    SEAL 3.4 header (magic, zero byte, compr u8, size u32, reserved u64)
    is recognized and upgraded to (3, 4); member payloads are rejected with
    a clear message rather than a bad-magic error."""
    import struct

    from seal_tpu import serialization as ser

    legacy = struct.pack("<HBBIQ", ser.SEAL_MAGIC, 0, 0, 48, 0)
    vmaj, vmin, compr, size = ser.load_header(legacy)
    assert (vmaj, vmin) == (3, 4)
    assert compr == ser.ComprMode.NONE
    assert size == 48
    # without upgrade: invalid
    import pytest as _pytest
    with _pytest.raises(ValueError):
        ser.load_header(legacy, try_upgrade_if_invalid=False)
    # full loads reject legacy member formats explicitly
    import io
    with _pytest.raises(ValueError, match="3.4"):
        ser.unwrap(io.BytesIO(legacy + b"\0" * 32))


@pytest.mark.parametrize("mode", [ser.ComprMode.NONE, ser.ComprMode.ZLIB,
                                  ser.ComprMode.ZSTD])
def test_all_compression_modes_roundtrip(ctx, keys, mode):
    """Every ComprMode (incl. zstd, parity: util/ztools.cpp) roundtrips a
    ciphertext bit-exactly."""
    import numpy as np

    kg, pk, _ = keys
    ct = Encryptor(ctx, pk).encrypt(Plaintext.from_hex_string("7x^1 + 2"))
    blob = ser.save_ciphertext(ct, compr_mode=mode)
    ct2 = ser.load_ciphertext(ctx, blob)
    assert np.array_equal(ct.to_numpy(), ct2.to_numpy())


def test_instance_save_load_methods(ctx, keys):
    """Reference-compat obj.save() / obj.load(context, data) methods
    (serialization.h Save/Load wrappers on every class): bytes identical
    to the function API, load rebinds onto the receiver."""
    from seal_tpu.dtypes import Ciphertext, RelinKeys, SecretKey

    kg, pk, rk = keys
    ct = Encryptor(ctx, pk).encrypt(Plaintext.from_hex_string("3x^2 + 1"))
    assert ct.save() == ser.save_ciphertext(ct)
    ct2 = Ciphertext()
    out = ct2.load(ctx, ct.save())
    assert out is ct2
    assert np.array_equal(ct.to_numpy(), ct2.to_numpy())

    sk = kg.secret_key()
    sk2 = SecretKey()
    sk2.load(ctx, sk.save())
    assert np.array_equal(sk.to_numpy(), sk2.to_numpy())

    rk2 = RelinKeys()
    rk2.load(ctx, rk.save())
    dec = Decryptor(ctx, sk)
    from seal_tpu import Evaluator
    ev = Evaluator(ctx)
    prod = ev.relinearize(ev.multiply(ct, ct), rk2)
    assert dec.decrypt(prod).to_hex_string() == "9x^4 + 6x^2 + 1"

    p = Plaintext.from_hex_string("5")
    p2 = Plaintext()
    p2.load(ctx, p.save())
    assert p2.to_hex_string() == "5"


def test_seeded_keys_byte_interop(ctx):
    """Seed-compressed keys (keygenerator.h Serializable<RelinKeys/
    GaloisKeys> overloads): save_seed=True halves the wire size by storing
    each digit's c1 PRNG info; bytes are identical to the reference's
    (vectors from tools/oracle/dump_seeded_keys.cpp — NOTE: consumes the
    module `ctx` but needs its own fresh PRNG stream, so builds its own
    context with the same parameters)."""
    W = json.loads((pathlib.Path(__file__).parent / "vectors" /
                    "seeded_keys_n64.json").read_text())
    parms = EncryptionParameters(SchemeType.BFV)
    parms.set_poly_modulus_degree(64)
    parms.set_coeff_modulus(CoeffModulus.create(64, [40, 40, 40]))
    parms.set_plain_modulus(257)
    parms.set_random_seed(SEED)
    c = SEALContext(parms, sec_level=SecLevelType.NONE)
    kg = KeyGenerator(c)
    rk = kg.create_relin_keys(save_seed=True)
    assert ser.save_relin_keys(rk) == bytes.fromhex(W["relin_keys_seeded"])
    gk = kg.create_galois_keys([3], save_seed=True)
    blob = ser.save_galois_keys(gk)
    assert blob == bytes.fromhex(W["galois_keys_seeded"])
    # the seeded blob expands to full working keys on load
    from seal_tpu import Evaluator
    rk2 = ser.load_relin_keys(c, ser.save_relin_keys(rk))
    gk2 = ser.load_galois_keys(c, blob)
    pk = kg.create_public_key()
    enc = Encryptor(c, pk)
    dec = Decryptor(c, kg.secret_key())
    ev = Evaluator(c)
    ct = enc.encrypt(Plaintext.from_hex_string("5"))
    assert dec.decrypt(ev.relinearize(ev.multiply(ct, ct), rk2)).to_hex_string() == "19"
    ev.apply_galois(ct, 3, gk2)  # must not raise
    # seeded is strictly smaller than the expanded serialization
    assert len(blob) < len(ser.save_galois_keys(kg.create_galois_keys([3])))


def test_seeded_public_key_byte_interop():
    """Serializable<PublicKey> (create_public_key() seeded overload): same
    PRNG consumption order as tools/oracle/dump_seeded_keys.cpp."""
    W = json.loads((pathlib.Path(__file__).parent / "vectors" /
                    "seeded_keys_n64.json").read_text())
    parms = EncryptionParameters(SchemeType.BFV)
    parms.set_poly_modulus_degree(64)
    parms.set_coeff_modulus(CoeffModulus.create(64, [40, 40, 40]))
    parms.set_plain_modulus(257)
    parms.set_random_seed(SEED)
    c = SEALContext(parms, sec_level=SecLevelType.NONE)
    kg = KeyGenerator(c)
    kg.create_relin_keys(save_seed=True)
    kg.create_galois_keys([3], save_seed=True)
    pk = kg.create_public_key(save_seed=True)
    blob = ser.save_public_key(pk)
    assert blob == bytes.fromhex(W["public_key_seeded"])
    # expands on load and encrypts/decrypts
    pk2 = ser.load_public_key(c, blob)
    ct = Encryptor(c, pk2).encrypt(Plaintext.from_hex_string("6"))
    assert Decryptor(c, kg.secret_key()).decrypt(ct).to_hex_string() == "6"


def test_ckks_bgv_wire_byte_interop():
    """CKKS NTT-form plaintext + asymmetric/seeded-symmetric ciphertexts
    and a BGV ciphertext, byte-identical to reference serializations
    (tools/oracle/dump_serialization_ckks.cpp — the base vectors cover
    only BFV)."""
    from seal_tpu.ckks import CKKSEncoder

    W = json.loads((pathlib.Path(__file__).parent / "vectors" /
                    "serialization_ckks_n64.json").read_text())
    parms = EncryptionParameters(SchemeType.CKKS)
    parms.set_poly_modulus_degree(64)
    parms.set_coeff_modulus(CoeffModulus.create(64, [40, 40, 40, 40]))
    parms.set_random_seed(SEED)
    c = SEALContext(parms, sec_level=SecLevelType.NONE)
    kg = KeyGenerator(c)
    enc = Encryptor(c, kg.create_public_key(), kg.secret_key())
    ce = CKKSEncoder(c)
    p = ce.encode(0.1 * np.arange(ce.slot_count) - 1.0, 2.0 ** 30)
    assert ser.save_plaintext(p) == bytes.fromhex(W["ckks_plain"])
    assert ser.save_ciphertext(enc.encrypt(p)) == bytes.fromhex(W["ckks_ct"])
    assert ser.save_ciphertext(enc.encrypt_symmetric(p, save_seed=True)) \
        == bytes.fromhex(W["ckks_ct_sym_seeded"])

    parms = EncryptionParameters(SchemeType.BGV)
    parms.set_poly_modulus_degree(64)
    parms.set_coeff_modulus(CoeffModulus.create(64, [40, 40, 40]))
    parms.set_plain_modulus(257)
    parms.set_random_seed(SEED)
    c2 = SEALContext(parms, sec_level=SecLevelType.NONE)
    kg2 = KeyGenerator(c2)
    ct2 = Encryptor(c2, kg2.create_public_key()).encrypt(
        Plaintext.from_hex_string("3x^5 + 1x^1 + 2"))
    assert ser.save_ciphertext(ct2) == bytes.fromhex(W["bgv_ct"])
    # and the reference bytes load back into working objects
    lp = ser.load_plaintext(c, bytes.fromhex(W["ckks_plain"]))
    got = ce.decode(lp)
    assert np.abs(got - (0.1 * np.arange(ce.slot_count) - 1.0)).max() < 1e-5
    dec2 = Decryptor(c2, kg2.secret_key())
    lct = ser.load_ciphertext(c2, bytes.fromhex(W["bgv_ct"]))
    assert dec2.decrypt(lct).to_hex_string() == "3x^5 + 1x^1 + 2"
    # CKKS seeded ct expands on load and decrypts (uses this context's sk)
    dec = Decryptor(c, kg.secret_key())
    sct = ser.load_ciphertext(c, bytes.fromhex(W["ckks_ct_sym_seeded"]))
    got2 = ce.decode(dec.decrypt(sct))
    assert np.abs(got2 - (0.1 * np.arange(ce.slot_count) - 1.0)).max() < 1e-5
