"""ops/cfft_tf.py — triple-float primitives and rounding edges (the
encoder-level exactness at scale 2^50 is pinned in
test_ckks_device_encoder; these pin the building blocks)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from seal_tpu.ops import cfft_tf as tf  # noqa: E402


def _to_int(neg, pair):
    lo = np.asarray(pair[0], dtype=np.uint64)
    hi = np.asarray(pair[1], dtype=np.uint64)
    v = hi.astype(object) * (1 << 32) + lo.astype(object)
    return np.array([-int(x) if n else int(x)
                     for x, n in zip(v, np.asarray(neg))], dtype=object)


def test_tf_round_exact_random():
    rng = np.random.default_rng(0)
    ints = [int(v) for v in rng.integers(-(2 ** 58), 2 ** 58, size=4000)]
    fracs = rng.uniform(-0.49, 0.49, size=4000)
    a0l, a1l, a2l = [], [], []
    reps = []
    for v, f in zip(ints, fracs):
        a0 = np.float32(v)
        r1 = v - int(a0)
        a1 = np.float32(r1)
        r2 = r1 - int(a1)
        a2 = np.float32(r2 + f)
        # the fraction actually representable in the third limb
        rep_frac = float(a2) - r2
        reps.append(v + (1 if rep_frac >= 0.5 else (-1 if rep_frac <= -0.5 else 0)))
        a0l.append(a0); a1l.append(a1); a2l.append(a2)
    neg, pair = tf.tf_round_to_u64_pair(
        (jnp.asarray(np.array(a0l)), jnp.asarray(np.array(a1l)),
         jnp.asarray(np.array(a2l))))
    got = _to_int(neg, pair)
    bad = sum(int(g != w) for g, w in zip(got, reps))
    assert bad == 0, f"{bad} misrounds"


def test_tf_mul_accuracy():
    from fractions import Fraction

    rng = np.random.default_rng(1)
    x = tf.tf_from_f64(rng.uniform(-1, 1, 200))
    y = tf.tf_from_f64(rng.uniform(-1, 1, 200))
    m = tf.tf_mul(tuple(jnp.asarray(a) for a in x),
                  tuple(jnp.asarray(a) for a in y))
    worst = 0.0
    for i in range(200):
        tx = sum(Fraction(float(a[i])) for a in x)
        ty = sum(Fraction(float(a[i])) for a in y)
        gm = sum(Fraction(float(np.asarray(c)[i])) for c in m)
        worst = max(worst, abs(float(gm - tx * ty)))
    assert worst < 2.0 ** -64, worst


def test_tf_twiddle_tables_unit_circle():
    t = tf.build_tf_tables(6)
    for st in t.stages:
        re = sum(np.asarray(c, dtype=np.float64) for c in st[:3])
        im = sum(np.asarray(c, dtype=np.float64) for c in st[3:])
        assert np.max(np.abs(re * re + im * im - 1.0)) < 1e-15
