"""Device complex FFT in double-double (two-float32) arithmetic.

The CKKS encoder FFT (ckks.h:448-502, 635-737) runs in C++ doubles; TPUs
have no fast f64, so the device path computes in df64 ("double-double"):
every real number is an unevaluated sum hi + lo of two float32s, giving
~48-bit precision (vs f64's 53). CKKS is approximate by construction and the
reference's own tests bound the error in tolerances this meets.

Layout choices keep the device free of gathers:
* encode uses decimation-in-TIME with bit-reversed INPUT — the host applies
  the (cheap, O(n) numpy) bit-reversal to the slot values it already holds;
* decode uses decimation-in-FREQUENCY with bit-reversed OUTPUT — the host
  folds the un-scramble into the slot-bin gather it performs anyway.
Cyclic-FFT twiddles depend only on the in-block index, so the tables are a
[n/2]-sized vector per stage — no per-position expansion.

A complex df64 tensor is a tuple (re_hi, re_lo, im_hi, im_lo) of f32 arrays.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

_SPLIT = np.float32(4097.0)  # 2^12 + 1: Dekker splitter for f32


# -- df64 primitives ---------------------------------------------------------

def _two_sum(a, b):
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _quick_two_sum(a, b):
    """Requires |a| >= |b|."""
    s = a + b
    return s, b - (s - a)


def _split(a):
    t = _SPLIT * a
    hi = t - (t - a)
    return hi, a - hi


def _two_prod(a, b):
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def df_add(x, y):
    s, e = _two_sum(x[0], y[0])
    e = e + x[1] + y[1]
    return _quick_two_sum(s, e)


def df_sub(x, y):
    return df_add(x, (-y[0], -y[1]))


def df_mul(x, y):
    p, e = _two_prod(x[0], y[0])
    e = e + (x[0] * y[1] + x[1] * y[0])
    return _quick_two_sum(p, e)


def df_neg(x):
    return (-x[0], -x[1])


def df_from_f64(v) -> tuple:
    """Host: split a float64 (array or scalar) into an (hi, lo) f32 pair."""
    v = np.asarray(v, dtype=np.float64)
    hi = v.astype(np.float32)
    lo = (v - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


# -- complex df64 ------------------------------------------------------------

def cadd(x, y):
    r = df_add(x[:2], y[:2])
    i = df_add(x[2:], y[2:])
    return r + i


def csub(x, y):
    r = df_sub(x[:2], y[:2])
    i = df_sub(x[2:], y[2:])
    return r + i


def cmul(x, y):
    xr, xi = x[:2], x[2:]
    yr, yi = y[:2], y[2:]
    r = df_sub(df_mul(xr, yr), df_mul(xi, yi))
    i = df_add(df_mul(xr, yi), df_mul(xi, yr))
    return r + i


# -- twiddle tables ----------------------------------------------------------

class CFFTTables(NamedTuple):
    """Per-stage twiddles: stage k has 2^k distinct values (DIT order)."""

    log_n: int
    # tuple over stages; each stage: 4 arrays [half] f32 (re_hi, re_lo, im_hi, im_lo)
    stages: tuple
    conj: bool


@functools.lru_cache(maxsize=None)
def _host_twiddles(log_n: int, conj: bool):
    out = []
    for s in range(1, log_n + 1):
        m = 1 << s
        half = m >> 1
        j = np.arange(half)
        ang = -2.0 * math.pi * j / m
        if conj:
            ang = -ang
        re_hi, re_lo = df_from_f64(np.cos(ang))
        im_hi, im_lo = df_from_f64(np.sin(ang))
        out.append((re_hi, re_lo, im_hi, im_lo))
    return tuple(out)


def build_cfft_tables(log_n: int, conj: bool = False) -> CFFTTables:
    host = _host_twiddles(log_n, conj)
    stages = tuple(tuple(jnp.asarray(a) for a in st) for st in host)
    return CFFTTables(log_n=log_n, stages=stages, conj=conj)


import jax.tree_util

jax.tree_util.register_pytree_node(
    CFFTTables,
    lambda t: ((t.stages,), (t.log_n, t.conj)),
    lambda aux, kids: CFFTTables(aux[0], kids[0], aux[1]),
)


# -- transforms --------------------------------------------------------------

def _view(x4, blocks, m):
    return tuple(a.reshape(a.shape[:-1] + (blocks, m)) for a in x4)


def _flat(x4, n):
    return tuple(a.reshape(a.shape[:-2] + (n,)) for a in x4)


def fft_dit_bitrev_in(x4, t: CFFTTables):
    """DFT (numpy fft convention, or its conjugate when t.conj) of a signal
    given in BIT-REVERSED order; output in natural order. x4: complex df64
    tuple of [..., n] f32 arrays."""
    n = 1 << t.log_n
    for s in range(1, t.log_n + 1):
        m = 1 << s
        half = m >> 1
        v4 = _view(x4, n // m, m)
        u = tuple(a[..., :half] for a in v4)
        v = tuple(a[..., half:] for a in v4)
        w = t.stages[s - 1]
        tv = cmul(v, w)
        y0 = cadd(u, tv)
        y1 = csub(u, tv)
        x4 = _flat(tuple(jnp.concatenate([a, b], axis=-1)
                         for a, b in zip(y0, y1)), n)
    return x4


def fft_dif_bitrev_out(x4, t: CFFTTables):
    """DFT of a natural-order signal; output in BIT-REVERSED order."""
    n = 1 << t.log_n
    for s in range(t.log_n, 0, -1):
        m = 1 << s
        half = m >> 1
        v4 = _view(x4, n // m, m)
        u = tuple(a[..., :half] for a in v4)
        v = tuple(a[..., half:] for a in v4)
        w = t.stages[s - 1]
        y0 = cadd(u, v)
        y1 = cmul(csub(u, v), w)
        x4 = _flat(tuple(jnp.concatenate([a, b], axis=-1)
                         for a, b in zip(y0, y1)), n)
    return x4


# -- df64 <-> integer helpers for the encoder --------------------------------

def df_round_to_u64_pair(hi, lo):
    """Round df64 values (|v| < 2^50) to integers as (sign, u64 limb pair).

    Returns (neg_mask bool, (lo32, hi32) u32 pair of |round(v)|)."""
    neg = (hi < 0) | ((hi == 0) & (lo < 0))
    ahi = jnp.where(neg, -hi, hi)
    alo = jnp.where(neg, -lo, lo)
    # split at 2^24: k = floor(a / 2^24), rem = a - k*2^24  (both f32-exact)
    p24 = jnp.float32(1 << 24)
    d_hi = ahi * jnp.float32(2.0 ** -24)
    d_lo = alo * jnp.float32(2.0 ** -24)
    k = jnp.floor(d_hi + d_lo)
    rem_hi, rem_lo = df_sub((ahi, alo), (k * p24, jnp.zeros_like(k)))
    # separated integer+fraction rounding: rem_hi's ulp can be 0.25-0.5 for
    # low chunks < 2^23, where adding rem_lo first collapses the fraction
    # onto a representable .5 and round-half-even misrounds by 1 (r4 fix,
    # same as cfft_tf.tf_round_to_u64_pair)
    fint = jnp.floor(rem_hi)
    fr = (rem_hi - fint) + rem_lo
    low = fint + jnp.floor(fr + jnp.float32(0.5))
    # normalize: low may fall outside [0, 2^24)
    kk = k + jnp.floor(low * jnp.float32(2.0 ** -24))
    low = low - jnp.floor(low * jnp.float32(2.0 ** -24)) * p24
    # low < 2^24 exact in f32 -> i32; k < 2^28 exact -> i32
    low_i = low.astype(jnp.int32).astype(jnp.uint32)
    k_i = kk.astype(jnp.int32).astype(jnp.uint32)
    from seal_tpu.ops import limb

    z = jnp.zeros_like(k_i)
    v = limb.add64(limb.shl64((k_i, z), 24), (low_i, z))
    return neg, v


def u32_to_df(x):
    """u32 array -> df64 (exact: 16-bit pieces)."""
    hi16 = (x >> 16).astype(jnp.int32).astype(jnp.float32)
    lo16 = (x & jnp.uint32(0xFFFF)).astype(jnp.int32).astype(jnp.float32)
    return df_add((hi16 * jnp.float32(65536.0), jnp.zeros_like(hi16)),
                  (lo16, jnp.zeros_like(lo16)))
