"""Per-prime device constants and coefficient-wise polynomial ops mod q.

The HE analogue of the reference's polyarithsmallmod layer
(/root/reference/native/src/seal/util/polyarithsmallmod.{h,cpp}): every op is
a vectorized elementwise computation over RNS tensors of shape [..., L, N]
held as u32 limb pairs, with per-prime constants broadcast from [L, 1].

Design: instead of the reference's iterator loop nests, each op is a pure
function on (lo, hi) uint32 arrays that XLA fuses into single VPU passes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from seal_tpu.modulus import Modulus
from seal_tpu.ops import limb


class ModConsts(NamedTuple):
    """Device-resident per-prime constants for a tower of L moduli.

    All arrays have shape [L, 1] so they broadcast against [L, N] data;
    leading batch axes broadcast implicitly.
    """

    q: limb.U64Pair        # modulus value
    two_q: limb.U64Pair    # 2*q (lazy-range bound)
    ratio0: limb.U64Pair   # word 0 of floor(2^128/q)
    ratio1: limb.U64Pair   # word 1 of floor(2^128/q)

    @property
    def count(self) -> int:
        return self.q[0].shape[0]

    def slice_levels(self, count: int) -> "ModConsts":
        """Constants for the first `count` primes of the tower."""
        return ModConsts(
            tuple(a[:count] for a in self.q),
            tuple(a[:count] for a in self.two_q),
            tuple(a[:count] for a in self.ratio0),
            tuple(a[:count] for a in self.ratio1),
        )

    def slice_row(self, i: int) -> "ModConsts":
        """Constants for prime row i only, shape [1, 1]."""
        return ModConsts(
            tuple(a[i:i + 1] for a in self.q),
            tuple(a[i:i + 1] for a in self.two_q),
            tuple(a[i:i + 1] for a in self.ratio0),
            tuple(a[i:i + 1] for a in self.ratio1),
        )


def make_mod_consts(moduli: list[Modulus] | list[int]) -> ModConsts:
    qs = [int(m) for m in moduli]
    L = len(qs)
    mask = (1 << 64) - 1

    def pairs(vals):
        return limb.arr_to_u64(vals, shape=(L, 1))

    ratios = [(1 << 128) // q for q in qs]
    return ModConsts(
        q=pairs(qs),
        two_q=pairs([2 * q for q in qs]),
        ratio0=pairs([r & mask for r in ratios]),
        ratio1=pairs([(r >> 64) & mask for r in ratios]),
    )


# ---------------------------------------------------------------------------
# Shoup operand tables ((operand, quotient) pairs as limb tensors)
# ---------------------------------------------------------------------------

def shoup_pair(values, moduli, shape=None):
    """Host: build (operand, quotient) u64 tensors for Shoup multiplication.

    values/moduli: nested lists of Python ints of identical shape.
    Returns (op_pair, quot_pair).
    """
    v = np.asarray(values, dtype=object)
    m = np.asarray(moduli, dtype=object)
    quot = np.empty(v.shape, dtype=object)
    if v.size:
        it = np.nditer(np.zeros(v.shape, dtype=np.int8), flags=["multi_index"])
        for _ in it:
            idx = it.multi_index
            quot[idx] = (int(v[idx]) << 64) // int(m[idx]) if int(m[idx]) else 0
    return (
        limb.arr_to_u64(v, shape=shape),
        limb.arr_to_u64(quot, shape=shape),
    )


# ---------------------------------------------------------------------------
# Coefficient-wise polynomial ops (parity: util/polyarithsmallmod.h)
# ---------------------------------------------------------------------------

def add_poly(a, b, mc: ModConsts):
    """(a + b) mod q, elementwise over [..., L, N]."""
    return limb.add_mod(a, b, mc.q)


def sub_poly(a, b, mc: ModConsts):
    return limb.sub_mod(a, b, mc.q)


def negate_poly(a, mc: ModConsts):
    return limb.neg_mod(a, mc.q)


def dyadic_product(a, b, mc: ModConsts):
    """Elementwise NTT-domain product (dyadic_product_coeffmod parity)."""
    return limb.mul_mod(a, b, mc.q, mc.ratio0, mc.ratio1)


def multiply_poly_scalar(a, scalar_op, scalar_quot, mc: ModConsts):
    """a * s mod q with s given as per-prime Shoup pairs of shape [L, 1]."""
    return limb.mul_mod_shoup(a, scalar_op, scalar_quot, mc.q)


def modulo_poly_coeffs(a, mc: ModConsts):
    """Reduce arbitrary u64 coefficients into [0, q)."""
    return limb.barrett_reduce_64(a, mc.q, mc.ratio1)


def negacyclic_shift_poly(a, shift: int, mc: ModConsts):
    """result[(i+shift) mod n] = ±a[i] in Z_q[x]/(x^n+1): a roll with the
    wrapped prefix negated (zero coefficients stay zero), vectorized over
    [..., L, N] (negacyclic_shift_poly_coeffmod,
    util/polyarithsmallmod.cpp:319-369)."""
    lo, hi = a
    n = lo.shape[-1]
    if not 0 <= shift < n:
        raise ValueError("shift must be in [0, n)")
    if shift == 0:
        return a
    rlo = jnp.roll(lo, shift, axis=-1)
    rhi = jnp.roll(hi, shift, axis=-1)
    wrapped = jnp.arange(n, dtype=jnp.uint32) < jnp.uint32(shift)
    mask = wrapped & ((rlo | rhi) != 0)
    neg = limb.sub64(mc.q, (rlo, rhi))
    return (jnp.where(mask, neg[0], rlo), jnp.where(mask, neg[1], rhi))


def negacyclic_multiply_mono(a, coeff_op, coeff_quot, exponent: int,
                             mc: ModConsts):
    """a · (c·x^e) mod (x^n+1, q): scalar Shoup multiply then negacyclic
    shift — the O(N) monomial path that replaces NTT→dyadic→INTT with an
    identical exact result (negacyclic_multiply_poly_mono_coeffmod,
    util/polyarithsmallmod.h:634-655)."""
    return negacyclic_shift_poly(
        multiply_poly_scalar(a, coeff_op, coeff_quot, mc), exponent, mc)


def poly_infty_norm(a, mc: ModConsts):
    """max_i |a_i| with coefficients centered mod q, per prime row: values
    ≥ (q+1)/2 count as q - a_i (poly_infty_norm_coeffmod parity). Returns a
    u64 pair of shape [..., L, 1]."""
    lo, hi = a
    one = (jnp.uint32(1), jnp.uint32(0))
    thr = limb.shr64(limb.add64(mc.q, one), 1)
    absv = limb.select64(limb.ge64(a, thr), limb.sub64(mc.q, a), a)
    mhi = jnp.max(absv[1], axis=-1, keepdims=True)
    mlo = jnp.max(jnp.where(absv[1] == mhi, absv[0], jnp.uint32(0)),
                  axis=-1, keepdims=True)
    return (mlo, mhi)
