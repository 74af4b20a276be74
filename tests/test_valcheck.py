"""Validity-check layer tests (parity: tests/seal/ — valcheck usage)."""

import numpy as np
import pytest

from seal_tpu import (
    CoeffModulus,
    EncryptionParameters,
    Encryptor,
    KeyGenerator,
    Plaintext,
    SEALContext,
    SchemeType,
    SecLevelType,
)
from seal_tpu import valcheck


@pytest.fixture(scope="module")
def env():
    parms = EncryptionParameters(SchemeType.BFV)
    parms.set_poly_modulus_degree(64)
    parms.set_coeff_modulus(CoeffModulus.create(64, [40, 40, 40]))
    parms.set_plain_modulus(257)
    ctx = SEALContext(parms, sec_level=SecLevelType.NONE)
    kg = KeyGenerator(ctx)
    pk = kg.create_public_key()
    return ctx, kg, pk


def test_valid_objects(env):
    ctx, kg, pk = env
    enc = Encryptor(ctx, pk)
    ct = enc.encrypt(Plaintext.from_hex_string("5"))
    assert valcheck.is_valid_for(ct, ctx)
    assert valcheck.is_valid_for(kg.secret_key(), ctx)
    assert valcheck.is_valid_for(pk, ctx)
    assert valcheck.is_valid_for(Plaintext.from_hex_string("1x^3 + 2"), ctx)
    rk = kg.create_relin_keys()
    assert valcheck.is_metadata_valid_for(rk, ctx)


def test_invalid_metadata(env):
    ctx, kg, pk = env
    enc = Encryptor(ctx, pk)
    ct = enc.encrypt(Plaintext.from_hex_string("5"))
    bad = ct.copy()
    bad.parms_id = (1, 2, 3, 4)
    assert not valcheck.is_metadata_valid_for(bad, ctx)
    # ciphertext at the pure key level is rejected when keyswitching is on
    key_level = ct.copy()
    key_level.parms_id = tuple(ctx.key_parms_id)
    assert not valcheck.is_metadata_valid_for(key_level, ctx)


def test_invalid_data(env):
    ctx, kg, pk = env
    enc = Encryptor(ctx, pk)
    ct = enc.encrypt(Plaintext.from_hex_string("5"))
    import jax.numpy as jnp

    bad = ct.copy()
    # set one coefficient to 2^63 (>= every modulus)
    bad.data = (bad.data[0], bad.data[1].at[0, 0, 0].set(jnp.uint32(0x80000000)))
    assert not valcheck.is_data_valid_for(bad, ctx)
    # oversized plaintext coefficient
    p = Plaintext(2)
    p.data[0] = 300  # >= t = 257
    assert not valcheck.is_data_valid_for(p, ctx)


def test_kswitch_data_check(env):
    """Key tensors get a coefficient-range check (valcheck.cpp:120-162)."""
    ctx, kg, pk = env
    rk = kg.create_relin_keys()
    assert valcheck.is_data_valid_for(rk, ctx)
    bad_lo = rk.keys[0][0].at[0, 0, 0, 0].set(np.uint32(0xFFFFFFFF))
    bad_hi = rk.keys[0][1].at[0, 0, 0, 0].set(np.uint32(0xFFFFFFFF))
    from seal_tpu.dtypes import RelinKeys

    bad = RelinKeys()
    bad.parms_id = rk.parms_id
    bad.keys = [(bad_lo, bad_hi)]
    assert not valcheck.is_data_valid_for(bad, ctx)


def test_corrupted_loads_rejected(env):
    """Untrusted payloads with out-of-range coefficients must be rejected
    at deserialization (parity: Ciphertext::load -> is_valid_for)."""
    from seal_tpu import serialization as ser

    ctx, kg, pk = env
    enc = Encryptor(ctx, pk)
    ct = enc.encrypt(Plaintext.from_hex_string("5"))

    # corrupt the last ciphertext coefficient to 2^63 (>= every modulus)
    blob = bytearray(ser.save_ciphertext(ct))
    blob[-8:] = (1 << 63).to_bytes(8, "little")
    with pytest.raises(ValueError):
        ser.load_ciphertext(ctx, bytes(blob))

    # corrupt a relin-key coefficient the same way
    rk = kg.create_relin_keys()
    kblob = bytearray(ser.save_relin_keys(rk))
    kblob[-8:] = (1 << 63).to_bytes(8, "little")
    with pytest.raises(ValueError):
        ser.load_relin_keys(ctx, bytes(kblob))

    # absurd dynarray count must fail cleanly, not overflow
    cblob = bytearray(ser.save_ciphertext(ct))
    count_off = 16 + 32 + 1 + 8 * 3 + 8 + 8 + 16  # outer hdr+meta, inner hdr
    cblob[count_off:count_off + 8] = (1 << 62).to_bytes(8, "little")
    with pytest.raises(ValueError):
        ser.load_ciphertext(ctx, bytes(cblob))

    # valid payloads still load
    ser.load_ciphertext(ctx, ser.save_ciphertext(ct))
    ser.load_relin_keys(ctx, ser.save_relin_keys(rk))
    ser.load_public_key(ctx, ser.save_public_key(pk))
    ser.load_secret_key(ctx, ser.save_secret_key(kg.secret_key()))
