"""Fused Pallas NTT kernel: all butterfly stages in VMEM, one HBM roundtrip.

The XLA stage-by-stage NTT (ops/ntt.py) pays a relayout per stage; this
kernel keeps the whole [R=N/128, C=128] coefficient tile resident in VMEM
and runs all log2(n) Harvey butterfly stages back to back on the VPU.

Formulation (roll + select, guaranteed Mosaic-lowerable):
* the coefficient tensor is viewed as [R, 128], flat index i = r*128 + c;
* a stage with gap g pairs i <-> i+g: partners are exchanged with
  pltpu-friendly rolls along the sublane axis (g >= 128) or lane axis
  (g < 128), and a ((i >> log2(g)) & 1) mask selects butterfly roles;
* per-stage root (operand, quotient) pairs are pre-expanded per position
  on the host ([log_n, R, C] per prime), so no in-kernel gathers;
* the inverse transform folds n^{-1} into its last stage by storing
  inv_n / (root * inv_n) in that stage's expanded table (the same fold as
  util/dwthandler.h:283-333) — every stage is then uniform.

Outputs are fully reduced to [0, q); results are bit-identical to
ops/ntt.py (and hence to the reference) because every step preserves the
value mod q.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from seal_tpu.ops import limb
from seal_tpu.ops.ntt import build_ntt_tables
from seal_tpu.utils import numth

LANES = 128

# Per-pass table budget for the expanded kernel's stage-range split
# (double-buffered by Pallas, so the VMEM working set is ~2x this + data).
# Tests shrink it to force the multi-pass path at small n.
_PASS_TABLE_BYTES = 7 << 20

# Paired-butterfly compaction flags. The roll+select formulation computes
# the Shoup multiply and both butterfly outputs at BOTH positions of every
# (i, i+gap) pair and selects — 2x redundant multiplies. Three compaction
# variants exist that do the work once per pair on half-size tensors
# (bit-identical by construction): the sublane split (gap >= 128), the
# legacy in-lane split (gap < 128; the 2026-08 Mosaic toolchain rejects its
# lane-splitting reshape), and the r3 transposed lane formulation (the
# kernel transposes the [R, C] tile so lane-gap pairs become supported
# sublane splits, with pre-transposed-and-halved tables in
# PallasNTTTables.fwd_lane/inv_lane).
#
# ALL DEFAULT OFF: a single-process interleaved A/B on v5e (2026-08-19,
# tools/ab_ntt_formulations.py, n=16384 B·L=32) measured roll+select at
# 8.0-9.4 us/transform vs 10.8 us sublane-only, 10.8 us lane_T-only and
# 11.6-12.4 us lane_T+sublane: on this toolchain the split/merge interleave
# reshapes cost more than the multiplies they save (the VPU has the spare
# multiply throughput; the shuffles serialize). Every path stays tested
# (tests/test_ntt_pallas.py parametrizes all combinations) for future
# toolchains that shift the balance back.
_PAIR_COMPACT_SUBLANE = False
_PAIR_COMPACT_LANE = False
_PAIR_COMPACT_LANE_T = False
# minimal sublane count for the transposed formulation (tiny tiles fall
# back to roll+select; n >= 1024 in practice)
_LANE_T_MIN_R = 8


def _pair_split_rows(a, gr):
    """[R, C] -> (x0_half, x1_half), each [R//2, C], for row-gap gr pairs."""
    R, C = a.shape
    A = R // (2 * gr)
    x4 = a.reshape(A, 2, gr, C)
    return x4[:, 0].reshape(R // 2, C), x4[:, 1].reshape(R // 2, C)


def _pair_merge_rows(y0, y1, gr):
    """Inverse of _pair_split_rows."""
    H, C = y0.shape
    A = H // gr
    y = jnp.stack([y0.reshape(A, gr, C), y1.reshape(A, gr, C)], axis=1)
    return y.reshape(2 * H, C)


def _pair_split_lanes(a, g):
    """[R, C] -> (x0_half, x1_half), each [R, C//2], for lane-gap g pairs."""
    R, C = a.shape
    A = C // (2 * g)
    x4 = a.reshape(R, A, 2, g)
    return x4[:, :, 0].reshape(R, C // 2), x4[:, :, 1].reshape(R, C // 2)


def _pair_merge_lanes(y0, y1, g):
    """Inverse of _pair_split_lanes."""
    R, H = y0.shape
    A = H // g
    y = jnp.stack([y0.reshape(R, A, g), y1.reshape(R, A, g)], axis=2)
    return y.reshape(R, 2 * H)


class PallasNTTTables(NamedTuple):
    """Expanded per-position root tables for a tower of L primes."""

    log_n: int                  # static
    fwd: tuple                  # 4 arrays [L, log_n, R, C]: op_lo, op_hi, qt_lo, qt_hi
    inv: tuple                  # same
    consts: jnp.ndarray         # u32 [L, 8]: q_lo, q_hi, 2q_lo, 2q_hi, 4q_lo, 4q_hi, 0, 0
    # transposed-and-halved lane-stage tables for the _PAIR_COMPACT_LANE_T
    # path: 4 arrays [L, S_lane, C//2, R] per direction (x0-half rows of the
    # stage table viewed as [C, R])
    fwd_lane: tuple = ()
    inv_lane: tuple = ()


jax.tree_util.register_pytree_node(
    PallasNTTTables,
    lambda t: (tuple(t[1:]), t.log_n),
    lambda log_n, kids: PallasNTTTables(log_n, *kids),
)


def _lane_stage_rows(log_n: int, inverse: bool):
    """Indices of the contiguous lane-gap stage run (gap < C); the folded
    final inverse stage is excluded (it is a row stage for every n > 2C)."""
    n = 1 << log_n
    C = min(n, LANES)
    gaps = _stage_geometry(log_n, inverse)
    rows = [i for i, g in enumerate(gaps)
            if g < C and not (inverse and i == log_n - 1)]
    if rows:
        assert rows == list(range(rows[0], rows[0] + len(rows)))
    return rows


@functools.lru_cache(maxsize=None)
def _expanded_host_tables(log_n: int, q: int):
    """Per-stage per-position (operand, quotient) for one prime, fwd + inv.

    Exact Python-int packing runs only over the n DISTINCT root powers; the
    [log_n, n] per-position expansion is numpy fancy indexing on the packed
    u32 arrays (the old per-position object vectorize cost ~2 s/prime at
    n=16384 and dominated context builds)."""
    n = 1 << log_n
    idx = np.arange(n, dtype=np.int64)

    def pack_vals(vals):
        """ints -> (op_lo, op_hi, qt_lo, qt_hi) u32 arrays of len(vals)."""
        arr = [int(v) for v in vals]
        quots = [(a << 64) // q for a in arr]
        return (
            np.array([a & 0xFFFFFFFF for a in arr], dtype=np.uint32),
            np.array([a >> 32 for a in arr], dtype=np.uint32),
            np.array([x & 0xFFFFFFFF for x in quots], dtype=np.uint32),
            np.array([(x >> 32) & 0xFFFFFFFF for x in quots], dtype=np.uint32),
        )

    from seal_tpu.ops.ntt import native_tables_np

    nat = native_tables_np(log_n, q)
    if nat is not None:
        # native table build (numpy u64): same values, no Python-int pass
        def split4(op, qt):
            m = np.uint64(0xFFFFFFFF)
            return ((op & m).astype(np.uint32),
                    (op >> np.uint64(32)).astype(np.uint32),
                    (qt & m).astype(np.uint32),
                    (qt >> np.uint64(32)).astype(np.uint32))

        fwd_packed = split4(nat[0], nat[1])
        inv_packed = split4(nat[2], nat[3])
        fin_packed = pack_vals((nat[4], nat[5]))
    else:
        h = build_ntt_tables(log_n, q)
        fwd_packed = pack_vals(h.root_powers)
        inv_packed = pack_vals(h.inv_root_powers)
        # final inverse stage: inv_n on x0 half, root*inv_n on the x1 half
        fin_packed = pack_vals((h.inv_degree, h.inv_last_scaled))

    fwd_idx = np.empty((log_n, n), dtype=np.int64)
    for s in range(log_n):
        fwd_idx[s] = (1 << s) + (idx >> (log_n - s))

    inv_idx = np.empty((max(log_n - 1, 0), n), dtype=np.int64)
    offset = 1
    row = 0
    for s in range(log_n - 1, 0, -1):
        inv_idx[row] = offset + (idx >> (log_n - s))
        offset += 1 << s
        row += 1
    last_sel = (idx >= (n >> 1)).astype(np.int64)

    fwd = [a[fwd_idx] for a in fwd_packed]
    inv = [
        np.concatenate([a[inv_idx], f[last_sel][None, :]], axis=0)
        for a, f in zip(inv_packed, fin_packed)
    ]
    return fwd, inv


def build_pallas_tables(log_n: int, moduli) -> PallasNTTTables:
    qs = [int(m) for m in moduli]
    n = 1 << log_n
    R = max(n // LANES, 1)
    C = min(n, LANES)
    fwd_all, inv_all = [], []
    for q in qs:
        f, i = _expanded_host_tables(log_n, q)
        fwd_all.append(f)
        inv_all.append(i)

    def stack(parts, k):
        return jnp.asarray(
            np.stack([p[k] for p in parts]).reshape(len(qs), log_n, R, C)
        )

    def lane_stack(parts, k, inverse):
        """Pre-transposed x0-half lane-stage tables [L, S_lane, C//2, R]."""
        rows = _lane_stage_rows(log_n, inverse)
        gaps = _stage_geometry(log_n, inverse)
        half = max(C // 2, 1)
        if not rows:
            return jnp.zeros((len(qs), 1, half, R), dtype=jnp.uint32)
        out = np.empty((len(qs), len(rows), half, R), dtype=np.uint32)
        cs = np.arange(C)
        for li, p in enumerate(parts):
            full = p[k].reshape(log_n, R, C)
            for si, srow in enumerate(rows):
                g = gaps[srow]
                sel = ((cs >> (g.bit_length() - 1)) & 1) == 0
                out[li, si] = full[srow].T[sel]
        return jnp.asarray(out)

    consts = np.zeros((len(qs), 8), dtype=np.uint32)
    for j, q in enumerate(qs):
        for k, v in enumerate((q, 2 * q, 4 * q)):
            consts[j, 2 * k] = v & 0xFFFFFFFF
            consts[j, 2 * k + 1] = (v >> 32) & 0xFFFFFFFF
    return PallasNTTTables(
        log_n=log_n,
        fwd=tuple(stack(fwd_all, k) for k in range(4)),
        inv=tuple(stack(inv_all, k) for k in range(4)),
        consts=jnp.asarray(consts),
        fwd_lane=tuple(lane_stack(fwd_all, k, False) for k in range(4)),
        inv_lane=tuple(lane_stack(inv_all, k, True) for k in range(4)),
    )


def _stage_geometry(log_n: int, inverse: bool):
    """(gap, axis, amount) per stage row in table order."""
    n = 1 << log_n
    gaps = []
    if not inverse:
        for s in range(log_n):
            gaps.append(n >> (s + 1))
    else:
        for s in range(log_n - 1, 0, -1):
            gaps.append(n >> (s + 1))
        gaps.append(n >> 1)
    return gaps


# ---------------------------------------------------------------------------
# Compact tables: per-stage distinct roots only (≈ log_n× less table traffic)
# ---------------------------------------------------------------------------
#
# The expanded tables above store one (operand, quotient) pair PER POSITION
# PER STAGE — [log_n, n] per prime, ~28× the data block, and the kernel is
# table-bandwidth-bound (BASELINE.md). A stage s only has n_roots distinct
# roots in blocks of n/n_roots consecutive positions, so the compact format
# stores:
#   * "row" stages (block ≥ 128 lanes): one root per [R,C]-tile row,
#     pre-expanded to an [R] column — S_row columns total;
#   * "lane" stages (block < 128): roots vary within a row; stored as
#     [R, n_roots/R] slices packed along lanes — the widths for every such
#     stage sum to ≤ 126, so ALL lane stages fit one [R, 128] tile.
# In-kernel expansion to per-position [R, C] uses the (otherwise idle) MXU:
# table values are stored as f32 16-bit halves and multiplied by a one-hot
# block-expansion matrix built from iota compares — an exact 0/1 selection,
# so results are bit-identical to the expanded path.


class PallasNTTCompact(NamedTuple):
    """Compact per-stage root tables (f32 16-bit-half layout)."""

    log_n: int                  # static
    fwd_row: jnp.ndarray        # f32 [L, 16R, S_row_f] (16 = 4 arrays × 4 8-bit quarters)
    fwd_lane: jnp.ndarray       # f32 [L, 16R, W_f]
    inv_row: jnp.ndarray
    inv_lane: jnp.ndarray
    consts: jnp.ndarray         # u32 [L, 8]

    def take(self, idx):
        return PallasNTTCompact(
            self.log_n, self.fwd_row[idx], self.fwd_lane[idx],
            self.inv_row[idx], self.inv_lane[idx], self.consts[idx])


jax.tree_util.register_pytree_node(
    PallasNTTCompact,
    lambda t: (tuple(t[1:]), t.log_n),
    lambda log_n, kids: PallasNTTCompact(log_n, *kids),
)


def _compact_layout(log_n: int, inverse: bool):
    """Static stage descriptors: (gap, n_roots, block, form, index/offset, w).

    form 'row': table column `index` holds the per-tile-row root.
    form 'lane': lanes [offset, offset+w) hold this stage's roots as
    [R, w] with block = C//w positions per root."""
    n = 1 << log_n
    R = max(n // LANES, 1)
    C = min(n, LANES)
    out = []
    row_idx = 0
    lane_off = 0
    for gap in _stage_geometry(log_n, inverse):
        # the folded final inverse stage has two multipliers in half-blocks
        final = inverse and len(out) == log_n - 1
        block = gap if final else 2 * gap
        n_roots = n // block
        if n_roots <= R:
            out.append((gap, n_roots, block, "row", row_idx, 1))
            row_idx += 1
        else:
            w = n_roots // R
            out.append((gap, n_roots, block, "lane", lane_off, w))
            lane_off += w
    return out, row_idx, lane_off


@functools.lru_cache(maxsize=None)
def _compact_host_tables(log_n: int, q: int):
    """Per-stage ordered distinct roots for one prime: fwd + inv lists of
    (op, quotient) int pairs, in block order."""
    h = build_ntt_tables(log_n, q)

    def shoup(vals):
        return [(int(v), (int(v) << 64) // q) for v in vals]

    fwd = []
    for s in range(log_n):
        fwd.append(shoup(h.root_powers[(1 << s):(1 << (s + 1))]))
    inv = []
    offset = 1
    for s in range(log_n - 1, 0, -1):
        m = 1 << s
        inv.append(shoup(h.inv_root_powers[offset:offset + m]))
        offset += m
    inv.append(shoup([h.inv_degree, h.inv_last_scaled]))
    return fwd, inv


def _pack_compact(log_n: int, qs, inverse: bool):
    """f32 16-bit-half tables [L, 8R, S_row] and [L, 8R, W]."""
    n = 1 << log_n
    R = max(n // LANES, 1)
    C = min(n, LANES)
    layout, n_row, n_lane = _compact_layout(log_n, inverse)
    L = len(qs)
    row = np.zeros((L, 16 * R, max(n_row, 1)), dtype=np.float32)
    lane = np.zeros((L, 16 * R, max(n_lane, 1)), dtype=np.float32)
    for li, q in enumerate(qs):
        fwd, inv = _compact_host_tables(log_n, q)
        stages = inv if inverse else fwd
        for (gap, n_roots, block, form, idx, w), roots in zip(layout, stages):
            # roots[b] -> 4 u32 words -> 8 f32 16-bit halves
            words = np.empty((len(roots), 4), dtype=np.uint64)
            for b, (op, qt) in enumerate(roots):
                words[b] = (op & 0xFFFFFFFF, op >> 32,
                            qt & 0xFFFFFFFF, qt >> 32)
            # 8-bit quarters are exact in a single bf16 MXU pass
            quarters = np.empty((len(roots), 16), dtype=np.float32)
            for qtr in range(4):
                quarters[:, qtr::4] = ((words >> (8 * qtr)) & 0xFF).astype(np.float32)
            if form == "row":
                rep = R // n_roots
                col = np.repeat(quarters, rep, axis=0)      # [R, 16]
                for k in range(16):
                    row[li, k * R:(k + 1) * R, idx] = col[:, k]
            else:
                grid = quarters.reshape(R, w, 16)           # [R, w, 16]
                for k in range(16):
                    lane[li, k * R:(k + 1) * R, idx:idx + w] = grid[:, :, k]
    return jnp.asarray(row), jnp.asarray(lane)


def build_pallas_tables_compact(log_n: int, moduli) -> PallasNTTCompact:
    qs = [int(m) for m in moduli]
    consts = np.zeros((len(qs), 8), dtype=np.uint32)
    for j, q in enumerate(qs):
        for k, v in enumerate((q, 2 * q, 4 * q)):
            consts[j, 2 * k] = v & 0xFFFFFFFF
            consts[j, 2 * k + 1] = (v >> 32) & 0xFFFFFFFF
    fr, fl = _pack_compact(log_n, qs, inverse=False)
    ir, il = _pack_compact(log_n, qs, inverse=True)
    return PallasNTTCompact(
        log_n=log_n, fwd_row=fr, fwd_lane=fl, inv_row=ir, inv_lane=il,
        consts=jnp.asarray(consts))


def _expand_stage(row_ref, lane_ref, form, idx, w, block, R, C):
    """Per-position (op_pair, qt_pair) [R, C] for one stage, via an exact
    one-hot MXU expansion of the compact f32 16-bit-half table."""
    if form == "row":
        src = row_ref[0, :, idx:idx + 1]                    # [16R, 1]
        E = jnp.ones((1, C), dtype=jnp.float32)
    else:
        src = lane_ref[0, :, idx:idx + w]                   # [16R, w]
        lb = block.bit_length() - 1
        j = jax.lax.broadcasted_iota(jnp.int32, (w, C), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (w, C), 1)
        E = (j == (c >> lb)).astype(jnp.float32)
    ex = jnp.dot(src, E, preferred_element_type=jnp.float32)  # [16R, C]
    # Mosaic has no f32->u32 cast; go through i32 (values are 8-bit
    # quarters, exact even in the MXU's single-pass bf16 f32 matmul)
    exi = ex.astype(jnp.int32).astype(jnp.uint32)
    words = []
    for k in range(4):
        p = [exi[(4 * k + qtr) * R:(4 * k + qtr + 1) * R] for qtr in range(4)]
        words.append(p[0] | (p[1] << 8) | (p[2] << 16) | (p[3] << 24))
    return ((words[0], words[1]), (words[2], words[3]))


def _ntt_kernel_compact(consts_ref, x_lo_ref, x_hi_ref, row_ref, lane_ref,
                        o_lo_ref, o_hi_ref, *, log_n: int, inverse: bool,
                        lazy: bool):
    n = 1 << log_n
    R = max(n // LANES, 1)
    C = min(n, LANES)
    l = pl.program_id(0)
    q = (consts_ref[l, 0], consts_ref[l, 1])
    two_q = (consts_ref[l, 2], consts_ref[l, 3])

    def bc(pair):
        return (jnp.full((R, C), pair[0], jnp.uint32),
                jnp.full((R, C), pair[1], jnp.uint32))

    qb = bc(q)
    two_qb = bc(two_q)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (R, C), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
    flat = row_ids * C + col_ids

    x = (x_lo_ref[0, 0], x_hi_ref[0, 0])
    layout, _, _ = _compact_layout(log_n, inverse)

    for row, (gap, n_roots, block, form, idx, wdt) in enumerate(layout):
        log_gap = gap.bit_length() - 1
        if gap >= C:
            shift_axis, amt, size = 0, gap // C, R
        else:
            shift_axis, amt, size = 1, gap, C
        fwd_l = pltpu.roll(x[0], size - amt, shift_axis)
        fwd_h = pltpu.roll(x[1], size - amt, shift_axis)
        bwd_l = pltpu.roll(x[0], amt, shift_axis)
        bwd_h = pltpu.roll(x[1], amt, shift_axis)
        is_x0 = ((flat >> log_gap) & 1) == 0
        u = (jnp.where(is_x0, x[0], bwd_l), jnp.where(is_x0, x[1], bwd_h))
        v = (jnp.where(is_x0, fwd_l, x[0]), jnp.where(is_x0, fwd_h, x[1]))
        w = _expand_stage(row_ref, lane_ref, form, idx, wdt, block, R, C)

        if not inverse:
            uu = limb.select64(limb.ge64(u, two_qb), limb.sub64(u, two_qb), u)
            vv = limb.mul_mod_shoup_lazy(v, w[0], w[1], qb)
            y0 = limb.add64(uu, vv)
            y1 = limb.sub64(limb.add64(uu, two_qb), vv)
        else:
            last = row == log_n - 1
            if last:
                u = limb.select64(limb.ge64(u, two_qb), limb.sub64(u, two_qb), u)
            s0 = limb.add64(u, v)
            s0 = limb.select64(limb.ge64(s0, two_qb), limb.sub64(s0, two_qb), s0)
            d = limb.sub64(limb.add64(u, two_qb), v)
            if last:
                t = (jnp.where(is_x0, s0[0], d[0]), jnp.where(is_x0, s0[1], d[1]))
                y = limb.mul_mod_shoup_lazy(t, w[0], w[1], qb)
                x = y
                continue
            y0 = s0
            y1 = limb.mul_mod_shoup_lazy(d, w[0], w[1], qb)
        x = (jnp.where(is_x0, y0[0], y1[0]), jnp.where(is_x0, y0[1], y1[1]))

    if not lazy:
        if not inverse:
            x = limb.select64(limb.ge64(x, two_qb), limb.sub64(x, two_qb), x)
        x = limb.select64(limb.ge64(x, qb), limb.sub64(x, qb), x)
    o_lo_ref[0, 0] = x[0]
    o_hi_ref[0, 0] = x[1]


def _call_compact(x_pair, t: PallasNTTCompact, inverse: bool, lazy: bool,
                  interpret: bool):
    log_n = t.log_n
    n = 1 << log_n
    R = max(n // LANES, 1)
    C = min(n, LANES)
    lo, hi = x_pair
    batch_shape = lo.shape[:-1]
    L = batch_shape[-1]
    B = int(np.prod(batch_shape[:-1], dtype=np.int64)) if len(batch_shape) > 1 else 1
    lo4 = lo.reshape(B, L, R, C)
    hi4 = hi.reshape(B, L, R, C)
    row_t = t.inv_row if inverse else t.fwd_row
    lane_t = t.inv_lane if inverse else t.fwd_lane

    kernel = functools.partial(
        _ntt_kernel_compact, log_n=log_n, inverse=inverse, lazy=lazy)

    grid = (L, B)
    data_spec = pl.BlockSpec(
        (1, 1, R, C), lambda l, b: (b, l, 0, 0), memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec(
        (1, 16 * R, row_t.shape[-1]), lambda l, b: (l, 0, 0),
        memory_space=pltpu.VMEM)
    lane_spec = pl.BlockSpec(
        (1, 16 * R, lane_t.shape[-1]), lambda l, b: (l, 0, 0),
        memory_space=pltpu.VMEM)
    consts_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[consts_spec, data_spec, data_spec, row_spec, lane_spec],
        out_specs=(
            pl.BlockSpec((1, 1, R, C), lambda l, b: (b, l, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, R, C), lambda l, b: (b, l, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, L, R, C), jnp.uint32),
            jax.ShapeDtypeStruct((B, L, R, C), jnp.uint32),
        ),
        interpret=interpret,
    )(t.consts, lo4, hi4, row_t, lane_t)
    return out[0].reshape(lo.shape), out[1].reshape(hi.shape)


def _ntt_kernel(consts_ref, x_lo_ref, x_hi_ref, w_refs, lane_refs,
                o_lo_ref, o_hi_ref, *, log_n: int, inverse: bool, lazy: bool,
                stage_lo: int = 0, stage_hi: int | None = None,
                lane_slice_lo: int = -1, lane_ok: bool = False,
                w_slice_lo: int | None = None):
    n = 1 << log_n
    R = max(n // LANES, 1)
    C = min(n, LANES)
    l = pl.program_id(0)
    q = (consts_ref[l, 0], consts_ref[l, 1])
    two_q = (consts_ref[l, 2], consts_ref[l, 3])

    def bc(pair):
        return (jnp.full((R, C), pair[0], jnp.uint32),
                jnp.full((R, C), pair[1], jnp.uint32))

    qb = bc(q)
    two_qb = bc(two_q)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (R, C), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
    flat = row_ids * C + col_ids

    x = (x_lo_ref[0, 0], x_hi_ref[0, 0])
    w_lo_op, w_hi_op, w_lo_qt, w_hi_qt = w_refs

    if stage_hi is None:
        stage_hi = log_n
    if w_slice_lo is None:
        w_slice_lo = stage_lo
    gaps = _stage_geometry(log_n, inverse)
    # `in_t` tracks the transposed-layout region (_PAIR_COMPACT_LANE_T):
    # lane-gap stages run on the [C, R] transpose, where pairs sit at
    # sublane gap `gap` and split/merge are supported reshapes. The region
    # is contiguous (end of the forward transform / start of the inverse),
    # so at most one transpose each way per pass.
    in_t = False
    # stage-range split (VMEM paging): the per-stage lazy-range invariant
    # ([0,4q) fwd entry / [0,2q) inv carry) holds at every stage boundary,
    # so running [stage_lo, stage_hi) as its own pallas_call with the table
    # slice for just those rows is bit-transparent — only the final
    # reduction is deferred to the pass that contains the last stage.
    for off, gap in enumerate(gaps[stage_lo:stage_hi]):
        row = stage_lo + off
        log_gap = gap.bit_length() - 1

        use_t = (gap < C and _PAIR_COMPACT_LANE_T and lane_ok
                 and R >= _LANE_T_MIN_R
                 and not (inverse and row == log_n - 1))
        if use_t:
            if not in_t:
                x = (x[0].T, x[1].T)
                in_t = True
            li = row - lane_slice_lo
            wh = ((lane_refs[0][0, li], lane_refs[1][0, li]),
                  (lane_refs[2][0, li], lane_refs[3][0, li]))
            u0, v0 = _pair_split_rows(x[0], gap)
            u1, v1 = _pair_split_rows(x[1], gap)
            u, v = (u0, u1), (v0, v1)
            qh = (jnp.full(u0.shape, q[0], jnp.uint32),
                  jnp.full(u0.shape, q[1], jnp.uint32))
            two_qh = (jnp.full(u0.shape, two_q[0], jnp.uint32),
                      jnp.full(u0.shape, two_q[1], jnp.uint32))
            if not inverse:
                uu = limb.select64(limb.ge64(u, two_qh), limb.sub64(u, two_qh), u)
                vv = limb.mul_mod_shoup_lazy(v, wh[0], wh[1], qh)
                y0 = limb.add64(uu, vv)
                y1 = limb.sub64(limb.add64(uu, two_qh), vv)
            else:
                y0 = limb.add64(u, v)
                y0 = limb.select64(limb.ge64(y0, two_qh), limb.sub64(y0, two_qh), y0)
                d = limb.sub64(limb.add64(u, two_qh), v)
                y1 = limb.mul_mod_shoup_lazy(d, wh[0], wh[1], qh)
            x = (_pair_merge_rows(y0[0], y1[0], gap),
                 _pair_merge_rows(y0[1], y1[1], gap))
            continue
        if in_t:
            # leaving the lane region (inverse): back to [R, C]
            x = (x[0].T, x[1].T)
            in_t = False

        wi = row - w_slice_lo
        w = ((w_lo_op[0, wi], w_hi_op[0, wi]), (w_lo_qt[0, wi], w_hi_qt[0, wi]))

        # paired-butterfly compaction: do the work once per (i, i+gap) pair
        # on half-size tensors (see _PAIR_COMPACT_* above); bit-identical
        if gap >= C:
            compact = _PAIR_COMPACT_SUBLANE
            split = functools.partial(_pair_split_rows, gr=gap // C)
            merge = functools.partial(_pair_merge_rows, gr=gap // C)
        else:
            compact = _PAIR_COMPACT_LANE
            split = functools.partial(_pair_split_lanes, g=gap)
            merge = functools.partial(_pair_merge_lanes, g=gap)
        if compact:
            u0, v0 = split(x[0])
            u1, v1 = split(x[1])
            u, v = (u0, u1), (v0, v1)
            qh = (jnp.full(u0.shape, q[0], jnp.uint32),
                  jnp.full(u0.shape, q[1], jnp.uint32))
            two_qh = (jnp.full(u0.shape, two_q[0], jnp.uint32),
                      jnp.full(u0.shape, two_q[1], jnp.uint32))
            # pair positions share the root, so the x0-half table suffices
            wh = ((split(w[0][0])[0], split(w[0][1])[0]),
                  (split(w[1][0])[0], split(w[1][1])[0]))
            if not inverse:
                uu = limb.select64(limb.ge64(u, two_qh), limb.sub64(u, two_qh), u)
                vv = limb.mul_mod_shoup_lazy(v, wh[0], wh[1], qh)
                y0 = limb.add64(uu, vv)
                y1 = limb.sub64(limb.add64(uu, two_qh), vv)
                x = (merge(y0[0], y1[0]), merge(y0[1], y1[1]))
            elif row == log_n - 1:
                # folded final stage: the two halves carry DIFFERENT
                # multipliers (inv_n / root*inv_n), so merge first and
                # multiply under the full per-position table
                u = limb.select64(limb.ge64(u, two_qh), limb.sub64(u, two_qh), u)
                s0 = limb.add64(u, v)
                s0 = limb.select64(limb.ge64(s0, two_qh), limb.sub64(s0, two_qh), s0)
                d = limb.sub64(limb.add64(u, two_qh), v)
                t = (merge(s0[0], d[0]), merge(s0[1], d[1]))
                x = limb.mul_mod_shoup_lazy(t, w[0], w[1], qb)
            else:
                s0 = limb.add64(u, v)
                s0 = limb.select64(limb.ge64(s0, two_qh), limb.sub64(s0, two_qh), s0)
                d = limb.sub64(limb.add64(u, two_qh), v)
                y1 = limb.mul_mod_shoup_lazy(d, wh[0], wh[1], qh)
                x = (merge(s0[0], y1[0]), merge(s0[1], y1[1]))
            continue

        if gap >= C:
            shift_axis, amt, size = 0, gap // C, R
        else:
            shift_axis, amt, size = 1, gap, C
        # partner values (pltpu.roll requires non-negative shifts; rolling
        # by size-amt moves index i+amt to position i, like np.roll(-amt))
        fwd_l = pltpu.roll(x[0], size - amt, shift_axis)
        fwd_h = pltpu.roll(x[1], size - amt, shift_axis)
        bwd_l = pltpu.roll(x[0], amt, shift_axis)
        bwd_h = pltpu.roll(x[1], amt, shift_axis)
        is_x0 = ((flat >> log_gap) & 1) == 0
        u = (jnp.where(is_x0, x[0], bwd_l), jnp.where(is_x0, x[1], bwd_h))
        v = (jnp.where(is_x0, fwd_l, x[0]), jnp.where(is_x0, fwd_h, x[1]))

        if not inverse:
            uu = limb.select64(limb.ge64(u, two_qb), limb.sub64(u, two_qb), u)
            vv = limb.mul_mod_shoup_lazy(v, w[0], w[1], qb)
            y0 = limb.add64(uu, vv)
            y1 = limb.sub64(limb.add64(uu, two_qb), vv)
        else:
            last = row == log_n - 1
            if last:
                u = limb.select64(limb.ge64(u, two_qb), limb.sub64(u, two_qb), u)
            s0 = limb.add64(u, v)
            s0 = limb.select64(limb.ge64(s0, two_qb), limb.sub64(s0, two_qb), s0)
            d = limb.sub64(limb.add64(u, two_qb), v)
            if last:
                # multiply both halves by the folded scalar table
                t = (jnp.where(is_x0, s0[0], d[0]), jnp.where(is_x0, s0[1], d[1]))
                y = limb.mul_mod_shoup_lazy(t, w[0], w[1], qb)
                x = y
                continue
            y0 = s0
            y1 = limb.mul_mod_shoup_lazy(d, w[0], w[1], qb)
        x = (jnp.where(is_x0, y0[0], y1[0]), jnp.where(is_x0, y0[1], y1[1]))

    if in_t:
        x = (x[0].T, x[1].T)
    if stage_hi == log_n and not lazy:
        if not inverse:
            x = limb.select64(limb.ge64(x, two_qb), limb.sub64(x, two_qb), x)
        x = limb.select64(limb.ge64(x, qb), limb.sub64(x, qb), x)
    o_lo_ref[0, 0] = x[0]
    o_hi_ref[0, 0] = x[1]


def _call(x_pair, t: PallasNTTTables, inverse: bool, lazy: bool, interpret: bool):
    log_n = t.log_n
    n = 1 << log_n
    R = max(n // LANES, 1)
    C = min(n, LANES)
    lo, hi = x_pair
    batch_shape = lo.shape[:-1]
    L = batch_shape[-1]
    B = int(np.prod(batch_shape[:-1], dtype=np.int64)) if len(batch_shape) > 1 else 1
    lo4 = lo.reshape(B, L, R, C)
    hi4 = hi.reshape(B, L, R, C)
    tables = t.inv if inverse else t.fwd

    lane_tables = (t.inv_lane if inverse else t.fwd_lane) or None
    lane_rows = _lane_stage_rows(log_n, inverse)
    lane_base = lane_rows[0] if lane_rows else 0
    # mirror of the kernel's use_t condition: when active, lane-stage rows
    # read the pre-halved transposed tables and the FULL table rows for them
    # are neither read nor fetched (the pass slices below skip them)
    lane_t_active = (_PAIR_COMPACT_LANE_T and R >= _LANE_T_MIN_R
                     and lane_tables is not None and bool(lane_rows))

    # VMEM paging: a pass's table slice is double-buffered, so its working
    # set is ~2 · (16n per full-table stage + 8n per transposed lane stage)
    # + the data block. Cap each pass at ~7 MB of tables (n=32768's full
    # 15 stages measured 18.11M > the 16M scoped VMEM limit); n <= 16384
    # stays a single pass.
    per_stage = ([8 * n if (i in set(lane_rows)) else 16 * n
                  for i in range(log_n)] if lane_t_active
                 else [16 * n] * log_n)
    # greedy fill decides HOW MANY passes fit the budget; stages then split
    # EVENLY across them (a maximally-packed first pass measured 18.6M >
    # the 16M scoped VMEM at n=32768 — balance is what keeps each pass's
    # double-buffered tables under the limit)
    # the data blocks (in/out/lane-table, double-buffered) and the kernel's
    # live [R, C] temporaries also scale with n and share scoped VMEM with
    # the double-buffered stage tables — measured fixed footprint ~128n
    # bytes (n=65536: 16.71M total with an 8.4M double-buffered 4-stage
    # table slice => 8.3M fixed). Give the tables half of what remains;
    # the n <= 32768 pass structure is unchanged by this formula. Above
    # n=65536 the fixed footprint alone exceeds scoped VMEM — the
    # dispatcher routes those sizes to the XLA kernel (config
    # pallas_ntt_max_n; the n=131072 Pallas paging logic stays validated
    # in interpret mode, tests/test_evaluator_reference.py TestHugeN).
    budget = min(_PASS_TABLE_BYTES, max(((31 << 19) - 128 * n) // 2, 16 * n))
    n_pass, acc = 1, 0
    for w in per_stage:
        if acc and acc + w > budget:
            n_pass += 1
            acc = 0
        acc += w
    bounds = [
        (p * log_n // n_pass, (p + 1) * log_n // n_pass) for p in range(n_pass)
    ]

    # Grid order (L, B): the batch axis iterates fastest, so consecutive
    # programs share the same prime's (multi-MB) expanded root tables and
    # Pallas elides the re-fetch — the kernel is otherwise table-bandwidth-
    # bound (tables are ~28x the data block).
    grid = (L, B)
    data_spec = pl.BlockSpec(
        (1, 1, R, C), lambda l, b: (b, l, 0, 0), memory_space=pltpu.VMEM)
    # full-array SMEM ref; rows are picked by program_id inside the kernel
    consts_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    cur = (lo4, hi4)
    for s0, s1 in bounds:
        # lane-table slice for this pass's lane-stage rows (a 1-row dummy
        # when the pass has none — Pallas rejects empty blocks)
        if lane_t_active:
            l0 = max(s0, lane_base)
            l1 = max(min(s1, lane_base + len(lane_rows)), l0)
            if l1 == l0:
                lane_lo, lane_hi, lane_slice_lo = 0, 1, -(1 << 30)
            else:
                lane_lo, lane_hi = l0 - lane_base, l1 - lane_base
                lane_slice_lo = l0
        else:
            lane_lo, lane_hi, lane_slice_lo = 0, 1, -(1 << 30)
        lane_args = (tuple(a[:, lane_lo:lane_hi] for a in lane_tables)
                     if lane_tables is not None else
                     tuple(jnp.zeros((L, 1, max(C // 2, 1), R), jnp.uint32)
                           for _ in range(4)))

        # FULL-table slice: only the rows the kernel actually reads — when
        # the transposed lane path is active, its rows come from the halved
        # lane tensors instead (the full rows would only waste VMEM; the
        # n=16384 single pass measured 16.07M > the 16M scoped limit with
        # them included). Row-stage rows are contiguous in every direction.
        full_rows = [r for r in range(s0, s1)
                     if not (lane_t_active and r in set(lane_rows))]
        if full_rows:
            w0r, w1r = full_rows[0], full_rows[-1] + 1
            assert full_rows == list(range(w0r, w1r))
            w_slice_lo = w0r
        else:
            w0r, w1r, w_slice_lo = 0, 1, -(1 << 30)

        kernel = functools.partial(
            _ntt_kernel, log_n=log_n, inverse=inverse, lazy=lazy,
            stage_lo=s0, stage_hi=s1, lane_slice_lo=lane_slice_lo,
            lane_ok=lane_slice_lo >= 0, w_slice_lo=w_slice_lo)
        table_spec = pl.BlockSpec(
            (1, w1r - w0r, R, C), lambda l, b: (l, 0, 0, 0),
            memory_space=pltpu.VMEM)
        lane_spec = pl.BlockSpec(
            (1, lane_hi - lane_lo, max(C // 2, 1), R),
            lambda l, b: (l, 0, 0, 0), memory_space=pltpu.VMEM)

        # kernel signature: consts, x_lo, x_hi, 4 tables, 4 lane tables
        # -> out lo, hi
        def body(consts, xl, xh, w0, w1, w2, w3, g0, g1, g2, g3, ol, oh,
                 _k=kernel):
            _k(consts, xl, xh, (w0, w1, w2, w3), (g0, g1, g2, g3), ol, oh)

        cur = pl.pallas_call(
            body,
            grid=grid,
            in_specs=[consts_spec, data_spec, data_spec,
                      table_spec, table_spec, table_spec, table_spec,
                      lane_spec, lane_spec, lane_spec, lane_spec],
            out_specs=(
                pl.BlockSpec((1, 1, R, C), lambda l, b: (b, l, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, R, C), lambda l, b: (b, l, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((B, L, R, C), jnp.uint32),
                jax.ShapeDtypeStruct((B, L, R, C), jnp.uint32),
            ),
            interpret=interpret,
        )(t.consts, cur[0], cur[1], *(a[:, w0r:w1r] for a in tables),
          *lane_args)
    return cur[0].reshape(lo.shape), cur[1].reshape(hi.shape)


def ntt_forward_pallas(x_pair, t, lazy: bool = False, interpret: bool = False):
    """Fused forward negacyclic NTT over [..., L, N] limb pairs."""
    if isinstance(t, PallasNTTCompact):
        return _call_compact(x_pair, t, inverse=False, lazy=lazy, interpret=interpret)
    return _call(x_pair, t, inverse=False, lazy=lazy, interpret=interpret)


def ntt_inverse_pallas(x_pair, t, lazy: bool = False, interpret: bool = False):
    """Fused inverse negacyclic NTT (n^{-1} folded into the last stage)."""
    if isinstance(t, PallasNTTCompact):
        return _call_compact(x_pair, t, inverse=True, lazy=lazy, interpret=interpret)
    return _call(x_pair, t, inverse=True, lazy=lazy, interpret=interpret)
