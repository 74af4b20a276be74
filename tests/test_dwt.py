"""utils/dwt.py — the reference-exact complex DWT engine.

The encoder-level bit-exactness is pinned by the golden suites
(test_ckks_bitexact, test_pipeline_n4096); these unit tests pin the two
implementation routes against EACH OTHER (native C butterflies vs the
vectorized numpy staging must agree double-for-double) and the exact
rounding helpers against Python reference semantics.
"""

import math

import numpy as np
import pytest

from seal_tpu.utils import dwt


@pytest.mark.parametrize("log_n", [3, 6, 10])
def test_native_matches_numpy_staging(log_n, monkeypatch):
    n = 1 << log_n
    roots, iroots = dwt.encoder_root_tables(n)
    rng = np.random.default_rng(log_n)
    re0 = rng.uniform(-3, 3, n)
    im0 = rng.uniform(-3, 3, n)

    def run(native: bool, transform, rts, scalar):
        if not native:
            monkeypatch.setattr(dwt, "_native_dwt", lambda *a: False)
        else:
            monkeypatch.undo()
        return transform(re0.copy(), im0.copy(), rts, scalar)

    for transform, rts in ((dwt.transform_from_rev, iroots),
                           (dwt.transform_to_rev, roots)):
        for scalar in (None, 0.37, 2.0 ** 40 / n):
            a_re, a_im = run(True, transform, rts, scalar)
            b_re, b_im = run(False, transform, rts, scalar)
            assert np.array_equal(a_re, b_re), (transform.__name__, scalar)
            assert np.array_equal(a_im, b_im), (transform.__name__, scalar)


def test_roundtrip_from_to_rev():
    """to_rev(from_rev(x, inv_roots with 1/n) , roots) recovers x within
    double rounding — the encoder/decoder pairing."""
    n = 256
    roots, iroots = dwt.encoder_root_tables(n)
    rng = np.random.default_rng(0)
    re = rng.uniform(-1, 1, n)
    im = rng.uniform(-1, 1, n)
    fre, fim = dwt.transform_from_rev(re.copy(), im.copy(), iroots,
                                      scalar=1.0 / n)
    bre, bim = dwt.transform_to_rev(fre, fim, roots)
    assert np.max(np.abs(bre - re)) < 1e-12
    assert np.max(np.abs(bim - im)) < 1e-12


def test_round_half_away():
    xs = np.array([0.5, -0.5, 1.5, -1.5, 2.4999, -2.4999, 2.5, -2.5, 0.0])
    want = np.array([1.0, -1.0, 2.0, -2.0, 2.0, -2.0, 3.0, -3.0, 0.0])
    got = dwt.round_half_away(xs)
    assert np.array_equal(got, want)
    # agrees with C++ std::round on a random sweep
    rng = np.random.default_rng(1)
    v = rng.uniform(-1e6, 1e6, 1000)
    got = dwt.round_half_away(v)
    want = np.array([math.floor(abs(x)) + (abs(x) - math.floor(abs(x)) >= 0.5)
                     for x in v])
    want = np.copysign(want, v)
    assert np.array_equal(got, want)
    for x, w in ((0.5, 1), (-0.5, -1), (1e15 + 0.5, 10**15 + 1), (-3.5, -4)):
        assert dwt.round_half_away_scalar(x) == w
