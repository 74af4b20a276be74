"""Fused Pallas kernel for the key-switch inner product.

Computes, for one decomposed target t_op[J, I, N] and one kswitch key
gathered to the extended tower k[J, c, I, N]:

    prod[c, i, :] = (sum_J t_op[J, i, :] * k[J, c, i, :]) mod q_i

with the full 128-bit lazy accumulation and a single Barrett-128 reduction
at the end — the exact algebra of the reference's switch_key inner loop
(/root/reference/native/src/seal/evaluator.cpp:2517-2547, where the lazy
accumulator is reduced only every SEAL_MULTIPLY_ACCUMULATE_USER_MOD_MAX=256
summands; L <= 64 decomp rows never trigger an intermediate reduction, so
one final reduction is bit-identical).

The XLA formulation of the same loop (evaluator._switch_key_reduce) spills
the 4-limb accumulator between the J steps; this kernel keeps it in VMEM
for the whole contraction, reading t_op and the key exactly once from HBM.
Bit-identical to the XLA path by construction (same limb helpers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from seal_tpu.ops import limb

LANES = 128

# double-buffered t+k block budget per program; the remaining scoped VMEM
# holds the 4-limb accumulator stack and the output block
_KS_VMEM_BUDGET = 9 * 1024 * 1024


def pack_mod_consts(moduli) -> np.ndarray:
    """u32 [I, 6] rows: q_lo, q_hi, ratio0_lo, ratio0_hi, ratio1_lo,
    ratio1_hi (the barrett_reduce_128 constants for each extended prime)."""
    qs = [int(m) for m in moduli]
    out = np.zeros((len(qs), 6), dtype=np.uint32)
    mask = 0xFFFFFFFF
    for i, q in enumerate(qs):
        ratio = (1 << 128) // q
        r0 = ratio & ((1 << 64) - 1)
        r1 = ratio >> 64
        out[i] = [q & mask, (q >> 32) & mask,
                  r0 & mask, (r0 >> 32) & mask,
                  r1 & mask, (r1 >> 32) & mask]
    return out


def _ks_kernel(consts_ref, t_lo_ref, t_hi_ref, k_lo_ref, k_hi_ref,
               o_lo_ref, o_hi_ref, *, J: int):
    i = pl.program_id(0)
    R, C = o_lo_ref.shape[2], o_lo_ref.shape[3]

    def bc(lo, hi):
        return (jnp.full((R, C), lo, jnp.uint32),
                jnp.full((R, C), hi, jnp.uint32))

    q = bc(consts_ref[i, 0], consts_ref[i, 1])
    r0 = bc(consts_ref[i, 2], consts_ref[i, 3])
    r1 = bc(consts_ref[i, 4], consts_ref[i, 5])

    z = jnp.zeros((R, C), jnp.uint32)
    acc = (z, z, z, z)
    for jj in range(J):
        t = (t_lo_ref[jj, 0], t_hi_ref[jj, 0])
        k = (k_lo_ref[jj, 0, 0], k_hi_ref[jj, 0, 0])
        acc = limb.mul_add_128(acc, t, k)
    out = limb.barrett_reduce_128(
        (acc[0], acc[1]), (acc[2], acc[3]), q, r0, r1)
    o_lo_ref[0, 0] = out[0]
    o_hi_ref[0, 0] = out[1]


def _ks_kernel_shoup(consts_ref, t_lo_ref, t_hi_ref, k_lo_ref, k_hi_ref,
                     kq_lo_ref, kq_hi_ref, o_lo_ref, o_hi_ref, *, J: int):
    """Shoup-quotient contraction: per-term mul_mod_shoup_lazy (< 2q) summed
    lazily (caller guarantees 2·J·q < 2^64), then a conditional-subtraction
    chain to [0, q). Same integer mod q as the 128-bit route — bit-identical
    output, ~half the VPU multiplies per term."""
    i = pl.program_id(0)
    R, C = o_lo_ref.shape[2], o_lo_ref.shape[3]
    q = (jnp.full((R, C), consts_ref[i, 0], jnp.uint32),
         jnp.full((R, C), consts_ref[i, 1], jnp.uint32))
    acc = None
    for jj in range(J):
        t = (t_lo_ref[jj, 0], t_hi_ref[jj, 0])
        k = (k_lo_ref[jj, 0, 0], k_hi_ref[jj, 0, 0])
        kq = (kq_lo_ref[jj, 0, 0], kq_hi_ref[jj, 0, 0])
        term = limb.mul_mod_shoup_lazy(t, k, kq, q)
        acc = term if acc is None else limb.add64(acc, term)
    s = (2 * J - 1).bit_length() - 1
    while s >= 0:
        acc = limb.cond_sub(acc, limb.shl64(q, s) if s else q)
        s -= 1
    o_lo_ref[0, 0] = acc[0]
    o_hi_ref[0, 0] = acc[1]


def keyswitch_inner_shoup_pallas(t_op, keys_ext, keys_quot,
                                 consts: np.ndarray,
                                 interpret: bool = False):
    """Shoup-route inner product. keys_quot: (lo, hi) u32 [J, 2, I, N] of
    floor(k·2^64/q_i) per key element (limb.shoup_quotient, cached once per
    loaded key). Caller must ensure 2·J·max(q) < 2^64 — with ≤61-bit moduli
    that holds for J ≤ 4; larger contractions use the 128-bit route.
    Returns (lo, hi) u32 [2, I, N] fully reduced, bit-identical to
    keyswitch_inner_pallas."""
    t_lo, t_hi = t_op
    k_lo, k_hi = keys_ext
    kq_lo, kq_hi = keys_quot
    J, I, n = t_lo.shape
    R = max(n // LANES, 1)
    C = min(n, LANES)
    t_lo4 = t_lo.reshape(J, I, R, C)
    t_hi4 = t_hi.reshape(J, I, R, C)
    k_lo5 = k_lo.reshape(J, 2, I, R, C)
    k_hi5 = k_hi.reshape(J, 2, I, R, C)
    kq_lo5 = kq_lo.reshape(J, 2, I, R, C)
    kq_hi5 = kq_hi.reshape(J, 2, I, R, C)

    # 6 double-buffered input blocks now (t, k, kq × lo/hi)
    rb = R
    while J * 6 * rb * C * 4 * 2 > _KS_VMEM_BUDGET and rb > 8:
        rb //= 2
    n_rb = R // rb

    grid = (I, n_rb, 2)
    t_spec = pl.BlockSpec((J, 1, rb, C), lambda i, r, c: (0, i, r, 0),
                          memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((J, 1, 1, rb, C), lambda i, r, c: (0, c, i, r, 0),
                          memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((1, 1, rb, C), lambda i, r, c: (c, i, r, 0),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_ks_kernel_shoup, J=J),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  t_spec, t_spec, k_spec, k_spec, k_spec, k_spec],
        out_specs=(o_spec, o_spec),
        out_shape=(
            jax.ShapeDtypeStruct((2, I, R, C), jnp.uint32),
            jax.ShapeDtypeStruct((2, I, R, C), jnp.uint32),
        ),
        interpret=interpret,
    )(jnp.asarray(consts), t_lo4, t_hi4, k_lo5, k_hi5, kq_lo5, kq_hi5)
    return out[0].reshape(2, I, n), out[1].reshape(2, I, n)


def keyswitch_inner_pallas(t_op, keys_ext, consts: np.ndarray,
                           interpret: bool = False):
    """t_op: (lo, hi) u32 [J, I, N]; keys_ext: (lo, hi) u32 [J, 2, I, N];
    consts: pack_mod_consts rows for the I extended moduli.
    Returns (lo, hi) u32 [2, I, N], fully reduced to [0, q_i)."""
    t_lo, t_hi = t_op
    k_lo, k_hi = keys_ext
    J, I, n = t_lo.shape
    R = max(n // LANES, 1)
    C = min(n, LANES)
    t_lo4 = t_lo.reshape(J, I, R, C)
    t_hi4 = t_hi.reshape(J, I, R, C)
    k_lo5 = k_lo.reshape(J, 2, I, R, C)
    k_hi5 = k_hi.reshape(J, 2, I, R, C)

    # Tile the coefficient-row axis so the double-buffered t+k blocks stay
    # under scoped VMEM (J=15, R=256 at n=32768 measured 17.54M > the 16M
    # limit). The contraction is elementwise in N — row tiling is exact.
    rb = R
    while J * 4 * rb * C * 4 * 2 > _KS_VMEM_BUDGET and rb > 8:
        rb //= 2
    n_rb = R // rb

    # grid (I, rblocks, 2) with c fastest: consecutive programs share the
    # same t_op block (index map ignores c), so Pallas elides its re-fetch.
    grid = (I, n_rb, 2)
    t_spec = pl.BlockSpec((J, 1, rb, C), lambda i, r, c: (0, i, r, 0),
                          memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((J, 1, 1, rb, C), lambda i, r, c: (0, c, i, r, 0),
                          memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((1, 1, rb, C), lambda i, r, c: (c, i, r, 0),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_ks_kernel, J=J),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  t_spec, t_spec, k_spec, k_spec],
        out_specs=(o_spec, o_spec),
        out_shape=(
            jax.ShapeDtypeStruct((2, I, R, C), jnp.uint32),
            jax.ShapeDtypeStruct((2, I, R, C), jnp.uint32),
        ),
        interpret=interpret,
    )(jnp.asarray(consts), t_lo4, t_hi4, k_lo5, k_hi5)
    return out[0].reshape(2, I, n), out[1].reshape(2, I, n)
