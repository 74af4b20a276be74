"""Device-side CKKS encoder (df64 FFT, VERDICT r1 item 4): precision
against the host/NumPy path and end-to-end pipeline interop.

The device path runs FFT + rounding + RNS decompose + NTT inside one jit
(encode) and INTT + exact multiword CRT compose + FFT (decode); the host
only permutes slot bins. Parity target: ckks.h:448-502, 635-737."""

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
def ck():
    parms = EncryptionParameters(SchemeType.CKKS)
    parms.set_poly_modulus_degree(128)
    parms.set_coeff_modulus(CoeffModulus.create(128, [40, 30, 30, 40]))
    ctx = SEALContext(parms, sec_level=SecLevelType.NONE)
    kg = KeyGenerator(ctx)
    pk = kg.create_public_key()
    rk = kg.create_relin_keys()
    return dict(ctx=ctx, kg=kg, rk=rk, enc=Encryptor(ctx, pk),
                dec=Decryptor(ctx, kg.secret_key()), ev=Evaluator(ctx),
                encoder=CKKSEncoder(ctx))


def test_device_encode_host_decode(ck):
    encoder = ck["encoder"]
    rng = np.random.default_rng(1)
    vals = rng.uniform(-10, 10, encoder.slot_count) \
        + 1j * rng.uniform(-10, 10, encoder.slot_count)
    p = encoder.encode_device(vals, 2.0 ** 30)
    out = encoder.decode(p, complex_out=True)
    assert np.max(np.abs(out - vals)) < 1e-5


def test_host_encode_device_decode(ck):
    encoder = ck["encoder"]
    vals = np.linspace(-3, 3, encoder.slot_count)
    p = encoder.encode(vals, 2.0 ** 30)
    out = encoder.decode_device(p)
    assert not np.iscomplexobj(out)
    assert np.max(np.abs(out - vals)) < 1e-5
    # device decode agrees with host decode to FFT rounding
    host = encoder.decode(p)
    assert np.max(np.abs(out - host)) < 1e-7


def test_device_roundtrip_and_pipeline(ck):
    encoder, enc, dec, ev, rk = (
        ck["encoder"], ck["enc"], ck["dec"], ck["ev"], ck["rk"])
    scale = 2.0 ** 30
    a = np.linspace(-1, 1, encoder.slot_count)
    ca = enc.encrypt(encoder.encode_device(a, scale))
    cb = enc.encrypt(encoder.encode_device(np.full_like(a, 2.5), scale))
    prod = ev.rescale_to_next(ev.relinearize(ev.multiply(ca, cb), rk))
    got = encoder.decode_device(dec.decrypt(prod))
    assert np.max(np.abs(got - a * 2.5)) < 1e-3


def test_device_encode_second_level(ck):
    ctx, encoder = ck["ctx"], ck["encoder"]
    next_id = ctx.first_context_data().next_context_data.parms_id
    vals = np.linspace(0, 1, encoder.slot_count)
    p = encoder.encode_device(vals, 2.0 ** 25, parms_id=next_id)
    assert p.parms_id == tuple(next_id)
    out = encoder.decode_device(p)
    assert np.max(np.abs(out - vals)) < 1e-4


def test_large_coeff_falls_back_to_host(ck):
    """Values pushing |coeff| past the df64-exact range route to the host
    encoder transparently."""
    encoder, dec, enc = ck["encoder"], ck["dec"], ck["enc"]
    vals = np.full(encoder.slot_count, 100.0)
    p = encoder.encode_device(vals, 2.0 ** 45)   # 100·2^45 > 2^46 gate
    out = encoder.decode(p)
    assert np.max(np.abs(out - vals)) < 1e-3


# -- triple-float extended range (r4, VERDICT r3 item 4) ----------------------

def _ideal_encode_ints(vals, scale, n, slot_bins):
    """Ideal encode integers m_j = round(scale/n * Re[FFT(bins)_j psi^-j])
    evaluated in 55-digit Decimal — the 'host big-int' comparator."""
    from decimal import Decimal, ROUND_HALF_EVEN, getcontext

    from seal_tpu.ops.cfft_tf import _PI_STR, _dec_cos_sin

    getcontext().prec = 55
    pi = Decimal(_PI_STR)
    M = 2 * n

    # e^{2*pi*i*k/M}: reduce k into the octant [0, M/8] by 8-fold symmetry
    def root(k):
        k %= M
        q8, q4, q2, q34 = M // 8, M // 4, M // 2, 3 * M // 4
        if k <= q4:
            j, sc, ss, sw = (k, 1, 1, False) if k <= q8 else (q4 - k, 1, 1, True)
        elif k <= q2:
            j2 = q2 - k
            j, sc, ss, sw = (j2, -1, 1, False) if j2 <= q8 else (q4 - j2, -1, 1, True)
        elif k <= q34:
            j2 = k - q2
            j, sc, ss, sw = (j2, -1, -1, False) if j2 <= q8 else (q4 - j2, -1, -1, True)
        else:
            j2 = M - k
            j, sc, ss, sw = (j2, 1, -1, False) if j2 <= q8 else (q4 - j2, 1, -1, True)
        c, s = _dec_cos_sin(2 * pi * j / M)
        if sw:
            c, s = s, c
        return sc * c, ss * s

    from functools import lru_cache
    root = lru_cache(maxsize=None)(root)

    slots = n >> 1
    bins = [(Decimal(0), Decimal(0))] * n
    bins = list(bins)
    for i in range(len(vals)):
        b = int(slot_bins[i])
        bins[b] = (Decimal(float(vals[i].real)), Decimal(float(vals[i].imag)))
        bins[n - 1 - b] = (Decimal(float(vals[i].real)),
                          -Decimal(float(vals[i].imag)))
    sc = Decimal(scale) / n
    out = []
    for j in range(n):
        acc = Decimal(0)
        for b in range(n):
            re, im = bins[b]
            if not re and not im:
                continue
            # Re[v * e^{-i*pi*(2b+1)j/n}] = re*cos(theta) + im*sin(theta)
            c, s = root(((2 * b + 1) * j) % M)
            acc += re * c + im * s
        v = sc * acc
        out.append(int(v.to_integral_value(rounding=ROUND_HALF_EVEN)))
    return out


def test_device_encode_tf_exact_scale_2_50():
    """Triple-float device encode at scale 2^50 (past the df64 2^46 cliff)
    must produce EXACTLY the ideal big-int rounding of the canonical
    embedding (55-digit Decimal evaluation)."""
    from seal_tpu.dtypes import to_device, to_host
    from seal_tpu.ops import ntt as ntt_mod

    n = 128
    parms = EncryptionParameters(SchemeType.CKKS)
    parms.set_poly_modulus_degree(n)
    parms.set_coeff_modulus(CoeffModulus.create(n, [60, 60, 60]))
    ctx = SEALContext(parms, sec_level=SecLevelType.NONE)
    encoder = CKKSEncoder(ctx)
    rng = np.random.default_rng(7)
    vals = rng.uniform(-8, 8, encoder.slot_count) \
        + 1j * rng.uniform(-8, 8, encoder.slot_count)
    scale = 2.0 ** 50
    p = encoder.encode_device(vals, scale)
    cd = ctx.first_context_data()
    rows = to_host(ntt_mod.ntt_inverse_eager(p.rns_data, cd.ntt_tables))
    ideal = _ideal_encode_ints(vals, scale, n, encoder._slot_bins)
    for j, q in enumerate(cd.key_moduli()):
        want = np.array([m % q for m in ideal], dtype=np.uint64)
        assert np.array_equal(rows[j], want), f"prime {j}"


def test_device_encode_tf_roundtrip_large_scale(ck):
    """TF-route encode (scale*|v| in [2^46, 2^56)) decodes back within CKKS
    tolerance; beyond 2^56 the host path takes over transparently."""
    encoder = ck["encoder"]
    vals = np.full(encoder.slot_count, 100.0)
    p = encoder.encode_device(vals, 2.0 ** 45)   # 100*2^45 ~ 2^51.6: tf route
    out = encoder.decode(p)
    assert np.max(np.abs(out - vals)) < 1e-6
