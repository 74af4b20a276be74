"""Batch-amortized host APIs (encode_many / encrypt_many / decrypt_many).

These are TPU-native extensions — the reference (batchencoder.h,
encryptor.h, decryptor.h, ckks.h) has only scalar overloads — whose
contract is BIT-IDENTITY with B sequential scalar calls: with a seeded
context, every batch result below is compared array-for-array against the
sequential loop. The point of the APIs is amortizing the fixed per-call
Python<->native crossing that dominates small-n host rows (BASELINE.md
"Fair-measurement note"); correctness here, perf in
tools/bench_host_api.py.
"""

import numpy as np
import pytest

from seal_tpu import (
    BatchEncoder,
    CKKSEncoder,
    CoeffModulus,
    Decryptor,
    EncryptionParameters,
    Encryptor,
    Evaluator,
    KeyGenerator,
    SchemeType,
    SEALContext,
    SecLevelType,
)

SEED = (1, 2, 3, 4, 5, 6, 7, 8)
# B = 13 = one 8-lane AVX-512 batch group + a 5-ct scalar remainder, so
# the bit-identity assertions exercise BOTH the batch-lane kernels
# (lanes8 NTT/DWT, q32 Shoup) and the scalar fallback in one run
B = 13


def _bfv_ctx(n=64, plain=257, bits=(40, 40, 40)):
    parms = EncryptionParameters(SchemeType.BFV)
    parms.set_poly_modulus_degree(n)
    parms.set_coeff_modulus(CoeffModulus.create(n, list(bits)))
    parms.set_plain_modulus(plain)
    parms.set_random_seed(SEED)
    return SEALContext(parms, sec_level=SecLevelType.NONE)


def _ckks_ctx(n=64, bits=(40, 30, 40)):
    parms = EncryptionParameters(SchemeType.CKKS)
    parms.set_poly_modulus_degree(n)
    parms.set_coeff_modulus(CoeffModulus.create(n, list(bits)))
    parms.set_random_seed(SEED)
    return SEALContext(parms, sec_level=SecLevelType.NONE)


def _bgv_ctx(n=64, plain=257, bits=(40, 40, 40)):
    parms = EncryptionParameters(SchemeType.BGV)
    parms.set_poly_modulus_degree(n)
    parms.set_coeff_modulus(CoeffModulus.create(n, list(bits)))
    parms.set_plain_modulus(plain)
    parms.set_random_seed(SEED)
    return SEALContext(parms, sec_level=SecLevelType.NONE)


def _ct_host(ct):
    h = ct.host_u64()
    if h is None:   # JAX-path ciphertexts (e.g. BGV asym mod-switch-down)
        from seal_tpu.dtypes import to_host

        h = to_host(ct.data)
    return np.asarray(h)


# ---------------------------------------------------------------------------
# BatchEncoder
# ---------------------------------------------------------------------------

def test_batchencoder_encode_many_bitexact():
    ctx = _bfv_ctx(plain=0)  # plain set below via batching prime
    parms = EncryptionParameters(SchemeType.BFV)
    parms.set_poly_modulus_degree(64)
    parms.set_coeff_modulus(CoeffModulus.create(64, [40, 40]))
    from seal_tpu import PlainModulus

    parms.set_plain_modulus(PlainModulus.batching(64, 20))
    parms.set_random_seed(SEED)
    ctx = SEALContext(parms, sec_level=SecLevelType.NONE)
    be = BatchEncoder(ctx)
    rng = np.random.default_rng(0)
    vals = rng.integers(0, int(parms.plain_modulus.value),
                        size=(B, be.slot_count), dtype=np.int64)
    batch = be.encode_many(vals)
    for b in range(B):
        single = be.encode(vals[b])
        assert np.array_equal(batch[b].data, single.data)
    # signed input + decode_many
    half = (int(parms.plain_modulus.value) - 1) // 2
    svals = rng.integers(-half, half + 1, size=(B, be.slot_count),
                         dtype=np.int64)
    batch = be.encode_many(svals)
    dec = be.decode_many(batch, signed=True)
    for b in range(B):
        assert np.array_equal(dec[b], be.decode(batch[b], signed=True))
        assert np.array_equal(dec[b], svals[b])
    # unsigned decode_many
    batch = be.encode_many(vals)
    dec = be.decode_many(batch)
    for b in range(B):
        assert np.array_equal(dec[b], be.decode(batch[b]))
    # short rows (m < slots)
    short = vals[:, :5]
    batch = be.encode_many(short)
    for b in range(B):
        assert np.array_equal(batch[b].data, be.encode(short[b]).data)
    # validation
    with pytest.raises(ValueError):
        be.encode_many(np.full((2, be.slot_count),
                               int(parms.plain_modulus.value),
                               dtype=np.int64))


# ---------------------------------------------------------------------------
# BFV encrypt/decrypt
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("asymmetric", [True, False])
def test_bfv_encrypt_many_bitexact(asymmetric):
    ctx = _bfv_ctx()
    kg = KeyGenerator(ctx)
    pk = kg.create_public_key()
    enc = Encryptor(ctx, pk, kg.secret_key())
    dec = Decryptor(ctx, kg.secret_key())
    from seal_tpu import Plaintext

    plains = [Plaintext.from_hex_string(hex(17 * b + 3)[2:] + "x^3 + "
                                        + hex(b + 1)[2:])
              for b in range(B)]
    fn_many = enc.encrypt_many if asymmetric else enc.encrypt_symmetric_many
    fn_one = enc.encrypt if asymmetric else enc.encrypt_symmetric
    cts = fn_many(plains)
    singles = [fn_one(p) for p in plains]
    for b in range(B):
        assert np.array_equal(_ct_host(cts[b]), _ct_host(singles[b])), b
    # decrypt_many round-trips and equals sequential decrypt
    outs = dec.decrypt_many(cts)
    for b in range(B):
        assert outs[b].to_hex_string() == plains[b].to_hex_string()
        assert outs[b].to_hex_string() == dec.decrypt(cts[b]).to_hex_string()


def test_bfv_encrypt_symmetric_many_save_seed():
    ctx = _bfv_ctx()
    kg = KeyGenerator(ctx)
    enc = Encryptor(ctx, kg.secret_key())
    from seal_tpu import Plaintext

    plains = [Plaintext.from_hex_string("2x^1 + " + hex(b + 1)[2:])
              for b in range(3)]
    cts = enc.encrypt_symmetric_many(plains, save_seed=True)
    singles = [enc.encrypt_symmetric(p, save_seed=True) for p in plains]
    for b in range(3):
        assert cts[b].seed_info == singles[b].seed_info
        assert np.array_equal(_ct_host(cts[b]), _ct_host(singles[b]))


# ---------------------------------------------------------------------------
# CKKS
# ---------------------------------------------------------------------------

def test_ckks_encode_many_bitexact():
    ctx = _ckks_ctx()
    ce = CKKSEncoder(ctx)
    rng = np.random.default_rng(1)
    vals = rng.normal(size=(B, ce.slot_count)) \
        + 1j * rng.normal(size=(B, ce.slot_count))
    scale = 2.0 ** 30
    batch = ce.encode_many(vals, scale)
    for b in range(B):
        single = ce.encode(vals[b], scale)
        assert np.array_equal(np.asarray(batch[b].host_rns_u64()),
                              np.asarray(single.host_rns_u64()))
    # decode_many bit-identical to sequential decode
    dec = ce.decode_many(batch, complex_out=True)
    for b in range(B):
        assert np.array_equal(dec[b], ce.decode(batch[b], complex_out=True))
    dec_r = ce.decode_many(batch)
    for b in range(B):
        assert np.array_equal(dec_r[b], ce.decode(batch[b]))


@pytest.mark.parametrize("asymmetric", [True, False])
def test_ckks_encrypt_decrypt_many_bitexact(asymmetric):
    ctx = _ckks_ctx()
    kg = KeyGenerator(ctx)
    pk = kg.create_public_key()
    enc = Encryptor(ctx, pk, kg.secret_key())
    dec = Decryptor(ctx, kg.secret_key())
    ce = CKKSEncoder(ctx)
    rng = np.random.default_rng(2)
    vals = rng.normal(size=(B, ce.slot_count))
    scale = 2.0 ** 30
    plains = ce.encode_many(vals, scale)
    fn_many = enc.encrypt_many if asymmetric else enc.encrypt_symmetric_many
    fn_one = enc.encrypt if asymmetric else enc.encrypt_symmetric
    cts = fn_many(plains)
    for b in range(B):
        assert np.array_equal(_ct_host(cts[b]), _ct_host(fn_one(plains[b])))
    outs = dec.decrypt_many(cts)
    for b in range(B):
        single = dec.decrypt(cts[b])
        assert np.array_equal(np.asarray(outs[b].host_rns_u64()),
                              np.asarray(single.host_rns_u64()))
    got = ce.decode_many(outs)
    assert np.max(np.abs(got - vals)) < 1e-4


# ---------------------------------------------------------------------------
# BGV
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("asymmetric", [True, False])
def test_bgv_encrypt_decrypt_many_bitexact(asymmetric):
    ctx = _bgv_ctx()
    kg = KeyGenerator(ctx)
    pk = kg.create_public_key()
    enc = Encryptor(ctx, pk, kg.secret_key())
    dec = Decryptor(ctx, kg.secret_key())
    from seal_tpu import Plaintext

    plains = [Plaintext.from_hex_string(
        hex((29 * b + 5) % 257)[2:] + "x^2 + 1") for b in range(B)]
    fn_many = enc.encrypt_many if asymmetric else enc.encrypt_symmetric_many
    fn_one = enc.encrypt if asymmetric else enc.encrypt_symmetric
    cts = fn_many(plains)
    for b in range(B):
        assert np.array_equal(_ct_host(cts[b]), _ct_host(fn_one(plains[b])))
    outs = dec.decrypt_many(cts)
    for b in range(B):
        assert outs[b].to_hex_string() == plains[b].to_hex_string()
        assert outs[b].to_hex_string() == dec.decrypt(cts[b]).to_hex_string()


# ---------------------------------------------------------------------------
# Batch results feed the Evaluator unchanged
# ---------------------------------------------------------------------------

def test_batch_cts_evaluate():
    """Ciphertexts from encrypt_many (lazy batch-view host data) must work
    through multiply+relinearize+decrypt like scalar-encrypted ones."""
    parms = EncryptionParameters(SchemeType.BFV)
    parms.set_poly_modulus_degree(64)
    parms.set_coeff_modulus(CoeffModulus.create(64, [40, 40, 40]))
    from seal_tpu import PlainModulus

    parms.set_plain_modulus(PlainModulus.batching(64, 20))
    parms.set_random_seed(SEED)
    ctx = SEALContext(parms, sec_level=SecLevelType.NONE)
    kg = KeyGenerator(ctx)
    enc = Encryptor(ctx, kg.create_public_key())
    dec = Decryptor(ctx, kg.secret_key())
    ev = Evaluator(ctx)
    rk = kg.create_relin_keys()
    be = BatchEncoder(ctx)
    t = int(parms.plain_modulus.value)
    vals = np.arange(2 * be.slot_count).reshape(2, be.slot_count) % 97
    cts = enc.encrypt_many(be.encode_many(vals))
    prod = ev.relinearize(ev.multiply(cts[0], cts[1]), rk)
    out = be.decode(dec.decrypt(prod))
    assert np.array_equal(out, (vals[0] * vals[1]) % t)
