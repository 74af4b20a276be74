"""Native (C++) host-engine components cross-checked against the exact
Python implementations they accelerate: blake2xb stream, CRT composition
(reference parity: util/blake2xb.c, util/rns.cpp:321-399)."""

import numpy as np
import pytest

from seal_tpu import native
from seal_tpu.ops.rns import RNSBase

pytestmark = pytest.mark.skipif(
    native.get_lib() is None, reason="native library unavailable"
)


class TestCRTComposer:
    @pytest.fixture(scope="class")
    def base(self):
        return RNSBase([(1 << 40) - 87, (1 << 41) - 143, (1 << 59) - 55])

    def test_compose_words_exact(self, base):
        comp = native.CRTComposer(base)
        rng = np.random.default_rng(11)
        rows = np.stack(
            [rng.integers(0, q, size=256, dtype=np.uint64) for q in base.base])
        words = comp.compose_words(rows)
        for j in range(0, 256, 37):
            want = base.compose([int(x) for x in rows[:, j]])
            got = sum(int(words[j, k]) << (64 * k) for k in range(comp.W))
            assert got == want

    def test_compose_center_f64(self, base):
        comp = native.CRTComposer(base)
        rng = np.random.default_rng(12)
        rows = np.stack(
            [rng.integers(0, q, size=128, dtype=np.uint64) for q in base.base])
        inv_scale = 1.0 / 2.0 ** 40
        got = comp.compose_center_f64(rows, inv_scale)
        Q, half = base.base_prod, (base.base_prod + 1) >> 1
        for j in range(128):
            v = base.compose([int(x) for x in rows[:, j]])
            if v >= half:
                v -= Q
            want = float(v) * inv_scale
            assert got[j] == pytest.approx(want, rel=1e-12, abs=1e-300)

    def test_single_prime_base(self):
        base = RNSBase([(1 << 50) - 27])
        comp = native.CRTComposer(base)
        rows = np.asarray([[5, 7, (1 << 50) - 28]], dtype=np.uint64)
        words = comp.compose_words(rows)
        assert [int(w[0]) for w in words] == [5, 7, (1 << 50) - 28]

    def test_many_primes(self):
        # wide base: 12 x ~50-bit primes -> ~600-bit Q exercises multiword path
        from seal_tpu.modulus import CoeffModulus

        qs = [m.value for m in CoeffModulus.create(4096, [50] * 12)]
        base = RNSBase(qs)
        comp = native.CRTComposer(base)
        rng = np.random.default_rng(13)
        rows = np.stack([rng.integers(0, q, size=32, dtype=np.uint64) for q in qs])
        words = comp.compose_words(rows)
        for j in range(32):
            want = base.compose([int(x) for x in rows[:, j]])
            got = sum(int(words[j, k]) << (64 * k) for k in range(comp.W))
            assert got == want
