"""Native (C++) host poly ops vs the JAX path: bit-exact cross-checks.

The native path (seal_tpu/native/poly.py + poly_native.cpp) carries the
keygen/encrypt-zero hot loop on a single host core; every op must be
value-identical to ops/ntt.py + ops/limb.py (and hence to the reference's
util/dwthandler.h + uintarithsmallmod.h)."""

import random

import numpy as np
import pytest

from seal_tpu import native
from seal_tpu.dtypes import to_device, to_host
from seal_tpu.modulus import CoeffModulus
from seal_tpu.native.poly import NativePolyOps
from seal_tpu.ops import limb
from seal_tpu.ops import ntt as ntt_mod

pytestmark = pytest.mark.skipif(
    native.get_lib() is None, reason="native library unavailable")

random.seed(31)


def _tables(log_n, bits):
    n = 1 << log_n
    qs = [int(m) for m in CoeffModulus.create(n, bits)]
    return qs, ntt_mod.build_device_tables(log_n, qs)


@pytest.mark.parametrize("log_n", [6, 10, 12])
def test_native_ntt_matches_jax(log_n):
    n = 1 << log_n
    qs, t = _tables(log_n, [30, 45, 50])
    npoly = NativePolyOps(t)
    assert npoly.available
    x_np = np.stack([np.array([random.randrange(q) for _ in range(n)],
                              dtype=np.uint64) for q in qs])

    ref = to_host(ntt_mod.ntt_forward(to_device(x_np), t))
    got = npoly.ntt_forward(x_np.copy())
    assert np.array_equal(got, ref)

    inv_ref = to_host(ntt_mod.ntt_inverse(to_device(got), t))
    inv_got = npoly.ntt_inverse(got.copy())
    assert np.array_equal(inv_got, inv_ref)
    assert np.array_equal(inv_got, x_np)  # roundtrip

    lazy = npoly.ntt_forward(x_np.copy(), lazy=True)
    for j, q in enumerate(qs):
        assert (lazy[j] < 4 * q).all()
        assert np.array_equal(lazy[j] % q, ref[j])


def test_native_table_builder_matches_python():
    log_n = 10
    qs, _ = _tables(log_n, [30, 45])
    for q in qs:
        nat = ntt_mod.native_tables_np(log_n, q)
        h = ntt_mod.build_ntt_tables(log_n, q)
        assert nat is not None
        assert [int(v) for v in nat[0]] == list(h.root_powers)
        assert [int(v) for v in nat[2]] == list(h.inv_root_powers)
        assert [int(v) for v in nat[1]] == [
            (v << 64) // q for v in h.root_powers]
        assert nat[4] == h.inv_degree
        assert nat[5] == h.inv_last_scaled


def test_native_keygen_c0_and_absorb():
    log_n, n = 9, 512
    qs, t = _tables(log_n, [35, 42])
    npoly = NativePolyOps(t)
    rng = np.random.default_rng(7)

    def rand_rows():
        return np.stack([rng.integers(0, q, size=n, dtype=np.uint64)
                         for q in qs])

    a, s, e = rand_rows(), rand_rows(), rand_rows()
    got = npoly.keygen_c0(a, s, e)
    for j, q in enumerate(qs):
        exp = [(-(int(x) * int(y) + int(z))) % q
               for x, y, z in zip(a[j], s[j], e[j])]
        assert [int(v) for v in got[j]] == exp

    c0 = rand_rows()
    key = rand_rows()
    factors = [123456789, 0]  # zero factor row must be untouched
    before = c0.copy()
    npoly.absorb(c0, key, factors)
    for j, (q, f) in enumerate(zip(qs, factors)):
        exp = [(int(x) + int(k) * f) % q for x, k in zip(before[j], key[j])]
        assert [int(v) for v in c0[j]] == exp

    x = rand_rows()
    scalars = [3, qs[1] - 1]
    expd = [[(int(v) * sc) % q for v in row]
            for row, sc, q in zip(x, scalars, qs)]
    npoly.mul_scalar(x, scalars)
    for j in range(len(qs)):
        assert [int(v) for v in x[j]] == expd[j]


def test_native_split_merge_roundtrip():
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 1 << 63, size=(3, 257), dtype=np.uint64)
    lo, hi = to_device(arr)
    assert np.array_equal(np.asarray(lo), (arr & 0xFFFFFFFF).astype(np.uint32))
    assert np.array_equal(np.asarray(hi), (arr >> 32).astype(np.uint32))
    assert np.array_equal(to_host((lo, hi)), arr)


def test_keygen_native_vs_jax_paths_identical():
    """Full keygen (sk/pk/relin/galois) with the native path on vs off is
    byte-identical under a fixed seed."""
    from seal_tpu import (CoeffModulus, EncryptionParameters, KeyGenerator,
                          SEALContext, SecLevelType)
    from seal_tpu.config import config
    from seal_tpu.encryption_params import SchemeType

    def run(use_native):
        old = config.use_native_keygen
        config.use_native_keygen = use_native
        try:
            n = 256
            parms = EncryptionParameters(SchemeType.BFV)
            parms.set_poly_modulus_degree(n)
            parms.set_coeff_modulus(CoeffModulus.create(n, [30, 30, 31]))
            parms.set_plain_modulus(65537)
            parms.set_random_seed((9, 8, 7, 6, 5, 4, 3, 2))
            ctx = SEALContext(parms, sec_level=SecLevelType.NONE)
            kg = KeyGenerator(ctx)
            pk = kg.create_public_key()
            rk = kg.create_relin_keys()
            gt = ctx.key_context_data().galois_tool
            gk = kg.create_galois_keys(gt.get_elts_all()[:2])
            return (to_host(kg.secret_key().data), to_host(pk.data.data),
                    [to_host(k) for k in rk.keys],
                    [to_host(k) for k in gk.keys if k is not None])
        finally:
            config.use_native_keygen = old

    nat = run(True)
    ref = run(False)
    assert np.array_equal(nat[0], ref[0])
    assert np.array_equal(nat[1], ref[1])
    for a, b in zip(nat[2], ref[2]):
        assert np.array_equal(a, b)
    for a, b in zip(nat[3], ref[3]):
        assert np.array_equal(a, b)
