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
