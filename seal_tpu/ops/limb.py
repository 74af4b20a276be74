"""uint32 limb-pair emulation of 64-bit (modular) arithmetic on device.

TPUs have no native 64-bit integer multiply, so every 64-bit value lives as a
pair ``(lo, hi)`` of uint32 jnp arrays and every 64-bit product is built from
16-bit partial products on the VPU. The algorithms mirror the reference's
word-level layer (/root/reference/native/src/seal/util/uintarithsmallmod.h:
barrett_reduce_64 :211, barrett_reduce_128 :167, multiply_uint_mod :236,
Shoup pairs :255-326) so device results are bit-identical to SEAL's — but
they are re-derived here for vectorized tensors rather than scalars.

Conventions
-----------
* A "u64 tensor" is a tuple ``(lo, hi)`` of same-shape uint32 arrays.
* Moduli are < 2^61, so values mod q and lazy [0,4q) ranges always fit.
* All functions broadcast: per-prime constants of shape [L, 1] combine with
  coefficient tensors of shape [L, N].

These run identically on CPU (tests) and TPU (production); Pallas kernels
reuse the same helpers inside kernel bodies.
"""

from __future__ import annotations

import jax.numpy as jnp

U32 = jnp.uint32
# Plain Python ints (not jnp constants) so Pallas kernels using these
# helpers do not capture tracer constants; jax weak-typing keeps uint32.
_M16 = 0xFFFF

U64Pair = tuple  # (lo: u32[...], hi: u32[...])


# ---------------------------------------------------------------------------
# Host <-> device conversion helpers
# ---------------------------------------------------------------------------

def to_u64(x: int) -> U64Pair:
    """Python int (< 2^64) -> scalar u64 tensor."""
    return (jnp.uint32(x & 0xFFFFFFFF), jnp.uint32((x >> 32) & 0xFFFFFFFF))


def arr_to_u64(values, shape=None) -> U64Pair:
    """Sequence of Python ints -> u64 tensor (lo, hi) of uint32 arrays."""
    import numpy as np

    v = np.asarray(values, dtype=object)
    lo = np.vectorize(lambda t: int(t) & 0xFFFFFFFF, otypes=[np.uint32])(v)
    hi = np.vectorize(lambda t: (int(t) >> 32) & 0xFFFFFFFF, otypes=[np.uint32])(v)
    if shape is not None:
        lo = lo.reshape(shape)
        hi = hi.reshape(shape)
    return jnp.asarray(lo), jnp.asarray(hi)


def u64_to_ints(x: U64Pair):
    """u64 tensor -> numpy object array of Python ints (host, for tests)."""
    import numpy as np

    lo = np.asarray(x[0], dtype=np.uint64)
    hi = np.asarray(x[1], dtype=np.uint64)
    out = np.empty(lo.shape, dtype=object)
    flat_lo, flat_hi, flat_out = lo.ravel(), hi.ravel(), out.ravel()
    for i in range(flat_lo.size):
        flat_out[i] = int(flat_lo[i]) | (int(flat_hi[i]) << 32)
    return out


# ---------------------------------------------------------------------------
# 32-bit building blocks
# ---------------------------------------------------------------------------

def mul32(a, b) -> U64Pair:
    """Full 64-bit product of two uint32 tensors via 16-bit partials."""
    a0 = a & _M16
    a1 = a >> 16
    b0 = b & _M16
    b1 = b >> 16
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    hh = a1 * b1
    mid = (ll >> 16) + (lh & _M16) + (hl & _M16)  # <= 3*(2^16-1), fits
    lo = (ll & _M16) | (mid << 16)
    hi = hh + (lh >> 16) + (hl >> 16) + (mid >> 16)
    return lo, hi


def _addc(a, b):
    """32-bit add with carry-out."""
    s = a + b
    return s, (s < a).astype(U32)


# ---------------------------------------------------------------------------
# 64-bit arithmetic
# ---------------------------------------------------------------------------

def add64(a: U64Pair, b: U64Pair) -> U64Pair:
    lo, c = _addc(a[0], b[0])
    hi = a[1] + b[1] + c
    return lo, hi


def add64c(a: U64Pair, b: U64Pair):
    """64-bit add returning (sum, carry_out)."""
    lo, c0 = _addc(a[0], b[0])
    hi1, c1 = _addc(a[1], b[1])
    hi, c2 = _addc(hi1, c0)
    return (lo, hi), c1 | c2


def sub64(a: U64Pair, b: U64Pair) -> U64Pair:
    lo = a[0] - b[0]
    borrow = (a[0] < b[0]).astype(U32)
    hi = a[1] - b[1] - borrow
    return lo, hi


def neg64(a: U64Pair) -> U64Pair:
    return sub64(to_u64(0), a)


def shl64(a: U64Pair, k: int) -> U64Pair:
    """Left shift by a static 0 <= k < 64."""
    if k == 0:
        return a
    if k >= 32:
        return jnp.zeros_like(a[0]), a[0] << (k - 32)
    return a[0] << k, (a[1] << k) | (a[0] >> (32 - k))


def shr64(a: U64Pair, k: int) -> U64Pair:
    """Logical right shift by a static 0 <= k < 64."""
    if k == 0:
        return a
    if k >= 32:
        return a[1] >> (k - 32), jnp.zeros_like(a[1])
    return (a[0] >> k) | (a[1] << (32 - k)), a[1] >> k


def lt64(a: U64Pair, b: U64Pair):
    return (a[1] < b[1]) | ((a[1] == b[1]) & (a[0] < b[0]))


def ge64(a: U64Pair, b: U64Pair):
    return ~lt64(a, b)


def eq64(a: U64Pair, b: U64Pair):
    return (a[0] == b[0]) & (a[1] == b[1])


def select64(pred, a: U64Pair, b: U64Pair) -> U64Pair:
    return jnp.where(pred, a[0], b[0]), jnp.where(pred, a[1], b[1])


def mul64(a: U64Pair, b: U64Pair):
    """Full 128-bit product: returns (p0, p1, p2, p3) uint32 limbs, low first."""
    l00, h00 = mul32(a[0], b[0])
    l01, h01 = mul32(a[0], b[1])
    l10, h10 = mul32(a[1], b[0])
    l11, h11 = mul32(a[1], b[1])

    p0 = l00
    # limb 1: h00 + l01 + l10
    s1, c1a = _addc(h00, l01)
    p1, c1b = _addc(s1, l10)
    c1 = c1a + c1b  # 0..2
    # limb 2: h01 + h10 + l11 + c1
    s2, c2a = _addc(h01, h10)
    s2b, c2b = _addc(s2, l11)
    p2, c2c = _addc(s2b, c1)
    c2 = c2a + c2b + c2c
    # limb 3: h11 + c2 (cannot overflow: true product < 2^128)
    p3 = h11 + c2
    return p0, p1, p2, p3


def mul64_lo(a: U64Pair, b: U64Pair) -> U64Pair:
    """Low 64 bits of the product (wrapping), cheaper than mul64."""
    l00, h00 = mul32(a[0], b[0])
    lo_mid = a[0] * b[1] + a[1] * b[0]  # wrapping u32 is exactly what we need
    return l00, h00 + lo_mid


def mul64_hi(a: U64Pair, b: U64Pair) -> U64Pair:
    """High 64 bits of the 128-bit product (multiply_uint64_hw64 parity)."""
    p = mul64(a, b)
    return p[2], p[3]


# ---------------------------------------------------------------------------
# Modular arithmetic mod a <= 61-bit modulus
# ---------------------------------------------------------------------------
# Per-prime constants are passed as broadcastable u64 tensors:
#   q          : the modulus value
#   ratio1     : word 1 of floor(2^128 / q)   (used by barrett_reduce_64)
#   ratio0     : word 0 of floor(2^128 / q)   (used by barrett_reduce_128)


def cond_sub(a: U64Pair, q: U64Pair) -> U64Pair:
    """a - q if a >= q else a (single correction step)."""
    return select64(ge64(a, q), sub64(a, q), a)


def add_mod(a: U64Pair, b: U64Pair, q: U64Pair) -> U64Pair:
    """(a + b) mod q for a, b < q < 2^62: sum cannot wrap 2^64."""
    return cond_sub(add64(a, b), q)


def sub_mod(a: U64Pair, b: U64Pair, q: U64Pair) -> U64Pair:
    """(a - b) mod q for a, b < q."""
    return cond_sub(sub64(add64(a, q), b), q)


def neg_mod(a: U64Pair, q: U64Pair) -> U64Pair:
    """(-a) mod q for a < q: q - a, with 0 fixed up."""
    nz = (a[0] | a[1]) != 0
    d = sub64(q, a)
    return jnp.where(nz, d[0], 0).astype(U32), jnp.where(nz, d[1], 0).astype(U32)


def barrett_reduce_64(x: U64Pair, q: U64Pair, ratio1: U64Pair) -> U64Pair:
    """x mod q for any 64-bit x (parity: uintarithsmallmod.h:211-230)."""
    approx_q = mul64_hi(x, ratio1)
    r = sub64(x, mul64_lo(approx_q, q))  # < 2q
    return cond_sub(r, q)


def barrett_reduce_128(
    x_lo: U64Pair, x_hi: U64Pair, q: U64Pair, ratio0: U64Pair, ratio1: U64Pair
) -> U64Pair:
    """(x_hi·2^64 + x_lo) mod q (parity: uintarithsmallmod.h:167-209).

    tmp1 = floor((x_lo·r0 + (x_lo·r1 + x_hi·r0 mod 2^128)) / 2^64) + x_hi·r1,
    result = x_lo - tmp1·q, then one conditional subtraction.
    """
    # Round 1: carry = hi64(x_lo * r0); t = x_lo * r1 (full 128)
    carry = mul64_hi(x_lo, ratio0)
    t0 = mul64(x_lo, ratio1)
    t_lo = (t0[0], t0[1])
    t_hi = (t0[2], t0[3])
    tmp1, c = add64c(t_lo, carry)
    tmp3 = add64(t_hi, (c, jnp.zeros_like(c)))
    # Round 2
    u = mul64(x_hi, ratio0)
    u_lo = (u[0], u[1])
    u_hi = (u[2], u[3])
    tmp1, c = add64c(tmp1, u_lo)
    carry2 = add64(u_hi, (c, jnp.zeros_like(c)))
    # tmp1 = x_hi * r1 + tmp3 + carry2   (low 64 suffices)
    quot = add64(add64(mul64_lo(x_hi, ratio1), tmp3), carry2)
    r = sub64(x_lo, mul64_lo(quot, q))
    return cond_sub(r, q)


def mul_mod(a: U64Pair, b: U64Pair, q: U64Pair, ratio0: U64Pair, ratio1: U64Pair) -> U64Pair:
    """(a * b) mod q via full product + Barrett-128."""
    p = mul64(a, b)
    return barrett_reduce_128((p[0], p[1]), (p[2], p[3]), q, ratio0, ratio1)


def mul_mod_shoup_lazy(x: U64Pair, y: U64Pair, y_quot: U64Pair, q: U64Pair) -> U64Pair:
    """x*y mod q in [0, 2q), with y < q and y's precomputed Shoup quotient
    floor(y·2^64/q); x may be any u64 (parity: multiply_uint_mod_lazy,
    uintarithsmallmod.h:313-326)."""
    hi = mul64_hi(x, y_quot)
    return sub64(mul64_lo(x, y), mul64_lo(hi, q))


def mul_mod_shoup(x: U64Pair, y: U64Pair, y_quot: U64Pair, q: U64Pair) -> U64Pair:
    """x*y mod q, fully reduced (parity: uintarithsmallmod.h:292-311)."""
    return cond_sub(mul_mod_shoup_lazy(x, y, y_quot, q), q)


def modulo_count_u64(x: U64Pair, q: U64Pair, ratio1: U64Pair) -> U64Pair:
    """Alias for barrett_reduce_64 used when reducing arbitrary u64 data."""
    return barrett_reduce_64(x, q, ratio1)


def shoup_quotient(y: U64Pair, q: U64Pair, ratio0: U64Pair,
                   ratio1: U64Pair) -> U64Pair:
    """floor(y·2^64 / q) for y < q — the Shoup quotient of a RUNTIME operand
    (keys), computed exactly on device from the Barrett constants.

    est = floor(y·ratio/2^64) with ratio = r1·2^64 + r0 = floor(2^128/q)
    satisfies true-1 <= est <= true (y < q < 2^62 makes the fractional loss
    < 1 on each side), so one conditional correction step is exact; a second
    is kept as margin. rem = y·2^64 - est·q < 2q < 2^63 survives mod-2^64
    arithmetic intact (the reference precomputes the same quotient on the
    host at key load, uintarithsmallmod.h:52-61 MultiplyUIntModOperand)."""
    est = add64(mul64_lo(y, ratio1), mul64_hi(y, ratio0))
    rem = neg64(mul64_lo(est, q))
    one = (jnp.ones_like(est[0]), jnp.zeros_like(est[1]))
    for _ in range(2):
        ge = ge64(rem, q)
        rem = select64(ge, sub64(rem, q), rem)
        est = select64(ge, add64(est, one), est)
    return est


# ---------------------------------------------------------------------------
# 128-bit accumulation (for base-conversion / keyswitch inner products)
# ---------------------------------------------------------------------------

def zero128(shape_like):
    z = jnp.zeros_like(shape_like)
    return (z, z, z, z)


def add128(a, b):
    """4-limb + 4-limb with carry propagation (mod 2^128)."""
    s0, c0 = _addc(a[0], b[0])
    s1a, c1a = _addc(a[1], b[1])
    s1, c1b = _addc(s1a, c0)
    c1 = c1a + c1b
    s2a, c2a = _addc(a[2], b[2])
    s2, c2b = _addc(s2a, c1)
    c2 = c2a + c2b
    s3 = a[3] + b[3] + c2
    return s0, s1, s2, s3


def mul_add_128(acc, a: U64Pair, b: U64Pair):
    """acc += a * b where acc is a 4-limb accumulator."""
    return add128(acc, mul64(a, b))


def multiply_add_mod(a: U64Pair, b: U64Pair, c: U64Pair, q: U64Pair,
                     ratio0: U64Pair, ratio1: U64Pair) -> U64Pair:
    """(a*b + c) mod q via 128-bit intermediate (multiply_add_uint_mod
    parity, uintarithsmallmod.h)."""
    p = mul64(a, b)
    lo, carry = add64c((p[0], p[1]), c)
    hi = add64((p[2], p[3]), (carry, jnp.zeros_like(carry)))
    return barrett_reduce_128(lo, hi, q, ratio0, ratio1)


def multiply_add_mod_shoup(a: U64Pair, y_op: U64Pair, y_quot: U64Pair,
                           c: U64Pair, q: U64Pair) -> U64Pair:
    """(a*y + c) mod q with Shoup pair for y; requires c < q."""
    return add_mod(mul_mod_shoup(a, y_op, y_quot, q), c, q)


# ---------------------------------------------------------------------------
# Generic small multiword arithmetic (u32 limb vectors, least-significant
# first) — used for >128-bit fixed-point accumulations.
# ---------------------------------------------------------------------------

def add_limbs(a, b, out_len=None):
    """Multiword add with carry; result truncated/zero-extended to out_len."""
    n = max(len(a), len(b))
    out_len = out_len or n
    zeros = jnp.zeros_like(a[0] if len(a) else b[0])
    out = []
    carry = zeros
    for k in range(out_len):
        x = a[k] if k < len(a) else zeros
        y = b[k] if k < len(b) else zeros
        s, c1 = _addc(x, y)
        s, c2 = _addc(s, carry)
        carry = c1 + c2
        out.append(s)
    return tuple(out)


def mul_limbs(a, b):
    """Schoolbook multiword multiply: len(a)+len(b) limbs out.

    Column sums are accumulated in u64 pairs, so each column may take up to
    2^32 partial terms without overflow — far above any real operand size.
    """
    la, lb = len(a), len(b)
    zeros = jnp.zeros_like(a[0])
    # partial products indexed by column
    cols_lo = [[] for _ in range(la + lb)]
    cols_hi = [[] for _ in range(la + lb)]
    for i in range(la):
        for j in range(lb):
            lo, hi = mul32(a[i], b[j])
            cols_lo[i + j].append(lo)
            cols_hi[i + j + 1].append(hi)
    out = []
    carry = (zeros, zeros)  # u64 carry into the current column
    for k in range(la + lb):
        acc = carry
        for term in cols_lo[k] + cols_hi[k]:
            acc = add64(acc, (term, zeros))
        out.append(acc[0])
        carry = (acc[1], zeros)
    return tuple(out)


def ge_limbs(a, b):
    """Multiword a >= b (same length), elementwise bool."""
    assert len(a) == len(b)
    res = jnp.ones_like(a[0], dtype=bool)
    decided = jnp.zeros_like(a[0], dtype=bool)
    for k in range(len(a) - 1, -1, -1):
        gt = a[k] > b[k]
        lt = a[k] < b[k]
        res = jnp.where(~decided & gt, True, jnp.where(~decided & lt, False, res))
        decided = decided | gt | lt
    return res


def sub_limbs(a, b):
    """Multiword a - b (same length, assumes a >= b), with borrow."""
    assert len(a) == len(b)
    out = []
    borrow = jnp.zeros_like(a[0])
    for k in range(len(a)):
        d1 = a[k] - b[k]
        b1 = (a[k] < b[k]).astype(jnp.uint32)
        d2 = d1 - borrow
        b2 = (d1 < borrow).astype(jnp.uint32)
        out.append(d2)
        borrow = b1 + b2
    return tuple(out)


def select_limbs(pred, a, b):
    """Elementwise multiword select."""
    return tuple(jnp.where(pred, x, y) for x, y in zip(a, b))
