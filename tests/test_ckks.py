"""CKKS scheme tests: encoder precision and full pipeline semantics
(tolerance-based like the reference suite tests/seal/ckks.cpp)."""

import numpy as np
import pytest

from seal_tpu import (
    CoeffModulus,
    Decryptor,
    EncryptionParameters,
    Encryptor,
    Evaluator,
    KeyGenerator,
    SEALContext,
    SchemeType,
    SecLevelType,
)
from seal_tpu.ckks import CKKSEncoder


@pytest.fixture(scope="module")
def ckks():
    parms = EncryptionParameters(SchemeType.CKKS)
    parms.set_poly_modulus_degree(128)
    parms.set_coeff_modulus(CoeffModulus.create(128, [40, 30, 30, 40]))
    ctx = SEALContext(parms, sec_level=SecLevelType.NONE)
    kg = KeyGenerator(ctx)
    pk = kg.create_public_key()
    rk = kg.create_relin_keys()
    gk = kg.create_galois_keys()
    return dict(ctx=ctx, kg=kg, pk=pk, rk=rk, gk=gk,
                enc=Encryptor(ctx, pk), dec=Decryptor(ctx, kg.secret_key()),
                ev=Evaluator(ctx), encoder=CKKSEncoder(ctx))


def test_encode_decode_roundtrip(ckks):
    encoder = ckks["encoder"]
    rng = np.random.default_rng(1)
    vals = rng.uniform(-10, 10, encoder.slot_count) + 1j * rng.uniform(-10, 10, encoder.slot_count)
    p = encoder.encode(vals, 2.0**30)
    out = encoder.decode(p, complex_out=True)
    assert np.max(np.abs(out - vals)) < 1e-5


def test_encode_scalar_broadcast(ckks):
    encoder = ckks["encoder"]
    p = encoder.encode(3.14159, 2.0**30)
    out = encoder.decode(p)
    assert np.max(np.abs(out - 3.14159)) < 1e-5


def test_encrypt_decrypt(ckks):
    encoder, enc, dec = ckks["encoder"], ckks["enc"], ckks["dec"]
    vals = np.linspace(-2, 2, encoder.slot_count)
    ct = enc.encrypt(encoder.encode(vals, 2.0**30))
    out = encoder.decode(dec.decrypt(ct))
    assert np.max(np.abs(out.real - vals)) < 1e-4


def test_add_sub(ckks):
    encoder, enc, dec, ev = ckks["encoder"], ckks["enc"], ckks["dec"], ckks["ev"]
    a = np.linspace(0, 1, encoder.slot_count)
    b = np.linspace(5, 6, encoder.slot_count)
    scale = 2.0**30
    ca = enc.encrypt(encoder.encode(a, scale))
    cb = enc.encrypt(encoder.encode(b, scale))
    assert np.max(np.abs(encoder.decode(dec.decrypt(ev.add(ca, cb))).real - (a + b))) < 1e-4
    assert np.max(np.abs(encoder.decode(dec.decrypt(ev.sub(ca, cb))).real - (a - b))) < 1e-4


def test_mult_relin_rescale(ckks):
    encoder, enc, dec, ev, rk = ckks["encoder"], ckks["enc"], ckks["dec"], ckks["ev"], ckks["rk"]
    a = np.linspace(-1, 1, encoder.slot_count)
    b = np.full(encoder.slot_count, 2.5)
    scale = 2.0**30
    ca = enc.encrypt(encoder.encode(a, scale))
    cb = enc.encrypt(encoder.encode(b, scale))
    prod = ev.rescale_to_next(ev.relinearize(ev.multiply(ca, cb), rk))
    out = encoder.decode(dec.decrypt(prod))
    assert np.max(np.abs(out.real - a * b)) < 1e-3
    # scale divided by the dropped prime
    assert prod.scale < scale * scale


def test_multiply_plain_ntt(ckks):
    encoder, enc, dec, ev = ckks["encoder"], ckks["enc"], ckks["dec"], ckks["ev"]
    a = np.linspace(1, 2, encoder.slot_count)
    scale = 2.0**30
    ct = enc.encrypt(encoder.encode(a, scale))
    p = encoder.encode(np.full(encoder.slot_count, 3.0), scale)
    out = encoder.decode(dec.decrypt(ev.rescale_to_next(ev.multiply_plain(ct, p))))
    assert np.max(np.abs(out.real - 3 * a)) < 1e-3


def test_rotate_vector_and_conjugate(ckks):
    encoder, enc, dec, ev, gk = ckks["encoder"], ckks["enc"], ckks["dec"], ckks["ev"], ckks["gk"]
    vals = np.arange(encoder.slot_count, dtype=np.float64) + 1j
    ct = enc.encrypt(encoder.encode(vals, 2.0**30))
    rot = ev.rotate_vector(ct, 5, gk)
    out = encoder.decode(dec.decrypt(rot), complex_out=True)
    assert np.max(np.abs(out - np.roll(vals, -5))) < 1e-3
    conj = ev.complex_conjugate(ct, gk)
    out = encoder.decode(dec.decrypt(conj), complex_out=True)
    assert np.max(np.abs(out - np.conj(vals))) < 1e-3


def test_mod_switch_drop(ckks):
    encoder, enc, dec, ev = ckks["encoder"], ckks["enc"], ckks["dec"], ckks["ev"]
    vals = np.linspace(0, 1, encoder.slot_count)
    ct = enc.encrypt(encoder.encode(vals, 2.0**30))
    dropped = ev.mod_switch_to_next(ct)
    assert dropped.coeff_modulus_size == ct.coeff_modulus_size - 1
    out = encoder.decode(dec.decrypt(dropped))
    assert np.max(np.abs(out.real - vals)) < 1e-4


def test_symmetric_and_encrypt_zero(ckks):
    encoder, dec = ckks["encoder"], ckks["dec"]
    enc_sym = Encryptor(ckks["ctx"], ckks["kg"].secret_key())
    vals = np.full(encoder.slot_count, 7.0)
    ct = enc_sym.encrypt_symmetric(encoder.encode(vals, 2.0**30))
    out = encoder.decode(dec.decrypt(ct))
    assert np.max(np.abs(out.real - 7.0)) < 1e-4


def test_encode_scalar_exact_constant_and_int(ckks):
    """Real-scalar and integer encodes are exact constant fills
    (ckks.cpp:75-214, :216-270), not FFT roundtrips."""
    import numpy as np
    from seal_tpu.dtypes import to_host

    encoder = ckks["encoder"]
    ctx = ckks["ctx"]
    cd = ctx.first_context_data()
    p = encoder.encode(2.5, 2.0 ** 20)
    rows = to_host(p.rns_data)
    want = int(round(2.5 * 2.0 ** 20))
    for j, q in enumerate(cd.key_moduli()):
        assert (rows[j] == want % q).all()
    assert np.max(np.abs(encoder.decode(p) - 2.5)) < 1e-5

    pi = encoder.encode_int(-7)
    assert pi.scale == 1.0
    rows = to_host(pi.rns_data)
    for j, q in enumerate(cd.key_moduli()):
        assert (rows[j] == (-7) % q).all()
    assert np.max(np.abs(encoder.decode(pi) - (-7))) < 1e-6

    # multiply_plain by an exact integer constant
    enc, dec, ev = ckks["enc"], ckks["dec"], ckks["ev"]
    vals = np.linspace(-1, 1, encoder.slot_count)
    ct = enc.encrypt(encoder.encode(vals, 2.0 ** 30))
    out = encoder.decode(dec.decrypt(ev.multiply_plain(ct, encoder.encode_int(3))))
    assert np.max(np.abs(out - 3 * vals)) < 1e-3


def test_noise_flooding_decrypt(ckks):
    """decrypt(flood_bits=b) — the Li-Micciancio CKKS countermeasure (no
    reference equivalent): adds fresh uniform noise ~2^b to the decryption.
    Accuracy degrades only by ~n*2^b/scale; two flooded decryptions of the
    same ciphertext differ (fresh randomness); flood_bits=0 is the exact
    reference-parity path."""
    enc, dec, encoder = ckks["enc"], ckks["dec"], ckks["encoder"]
    from seal_tpu.dtypes import to_host

    vals = np.linspace(-1, 1, encoder.slot_count)
    ct = enc.encrypt(encoder.encode(vals, 2.0 ** 35))

    plain = dec.decrypt(ct)
    flooded = dec.decrypt(ct, flood_bits=15)
    # still accurate: flooding magnitude 2^15 << scale 2^35
    got = encoder.decode(flooded)
    assert np.max(np.abs(got - vals)) < 1e-3
    # noticeably noisier than the exact decryption path, and actually flooded
    assert not np.array_equal(to_host(flooded.rns_data), to_host(plain.rns_data))
    # randomized per call
    flooded2 = dec.decrypt(ct, flood_bits=15)
    assert not np.array_equal(to_host(flooded.rns_data), to_host(flooded2.rns_data))
    # flood_bits=0 stays bit-identical to the default path
    again = dec.decrypt(ct, flood_bits=0)
    assert np.array_equal(to_host(again.rns_data), to_host(plain.rns_data))


def test_noise_flooding_rejected_for_exact_schemes():
    from seal_tpu.modulus import PlainModulus

    parms = EncryptionParameters(SchemeType.BFV)
    parms.set_poly_modulus_degree(64)
    parms.set_coeff_modulus(CoeffModulus.create(64, [40, 40]))
    parms.set_plain_modulus(PlainModulus.batching(64, 20))
    ctx = SEALContext(parms, sec_level=SecLevelType.NONE)
    kg = KeyGenerator(ctx)
    enc = Encryptor(ctx, kg.create_public_key())
    dec = Decryptor(ctx, kg.secret_key())
    from seal_tpu.encoders import BatchEncoder

    ct = enc.encrypt(BatchEncoder(ctx).encode([1, 2, 3]))
    with pytest.raises(ValueError, match="CKKS-only"):
        dec.decrypt(ct, flood_bits=10)
