"""Coefficient-axis (sequence-parallel) negacyclic NTT via the four-step
decomposition — the HE analogue of ring-attention-style sequence sharding
(SURVEY.md §2.11, §5.7). The reference has no distributed backend at all;
this is new TPU-first design, not a port.

Math. For n = P·M with the coefficient axis split into P contiguous shards
of M coefficients, the negacyclic NTT out[j] = Σ_i a_i ψ^{i(2·br_n(j)+1)}
(Harvey bit-reversed output, util/ntt.cpp:240-299 ordering) factors as

    b_i            = a_i · ψ^i                     (local pre-twiddle)
    c_r[i2]        = Σ_{i1} b[i1·M+i2] · w_P^{i1·r}  (P-point DFT across shards)
    d_r[i2]        = c_r[i2] · w^{i2·r}            (local twiddle)
    out shard p    = cyclic M-point NTT of d_r     (natural→bit-reversed)

with w = ψ², w_P = w^M, and r = br_P(p). Because
br_n(p·M + j2) = br_M(j2)·P + br_P(p), shard p's local result lands exactly
at global bit-reversed positions — the ONLY communication is one all_gather
of the pre-twiddled poly over the shard axis (and symmetrically one for the
inverse). All twiddle tables are pre-permuted by shard index p, so the
kernel body contains no axis_index lookups: shard_map in_specs do the work.

Bit-exactness: every value is fully reduced mod q at each step, so the
sharded transform equals the single-chip kernel (ops/ntt.py) bit-for-bit.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import jax.tree_util
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from seal_tpu.ops import limb
from seal_tpu.ops.modring import ModConsts, make_mod_consts
from seal_tpu.ops.ntt import _bview, _guard, _root_slice
from seal_tpu.utils import numth


def _bitrev(i: int, bits: int) -> int:
    return numth.reverse_bits(i, bits) if bits else 0


def _shoup(values, qs, shape):
    """values: nested list [L][...] of ints -> Shoup (op, quotient) pair."""
    flat_ops, flat_qts = [], []
    for row, q in zip(values, qs):
        flat = np.asarray(row, dtype=object).reshape(-1)
        flat_ops.append([int(v) for v in flat])
        flat_qts.append([(int(v) << 64) // q for v in flat])
    L = len(qs)
    return (
        limb.arr_to_u64(flat_ops, shape=(L,) + shape),
        limb.arr_to_u64(flat_qts, shape=(L,) + shape),
    )


class FourStepTables(NamedTuple):
    """Device tables for a P-way coefficient-sharded size-n NTT.

    Axes named [L, ...]; tables with a leading shard axis are pre-permuted
    so that index p (not br(p)) selects the right row, letting shard_map
    in_specs shard them directly.
    """

    log_n: int                     # static
    shards: int                    # static: P
    mc: ModConsts                  # [L, 1] modulus constants
    psi_op: limb.U64Pair           # [L, n]   ψ^i natural order (fwd pre-twiddle)
    psi_qt: limb.U64Pair
    ipsi_op: limb.U64Pair          # [L, n]   ψ^{-i}·n^{-1}·... see builder
    ipsi_qt: limb.U64Pair
    wp_op: limb.U64Pair            # [L, P, P]  w_P^{i1·br(p)}  (row p)
    wp_qt: limb.U64Pair
    tw_op: limb.U64Pair            # [L, P, M]  w^{i2·br(p)}    (row p)
    tw_qt: limb.U64Pair
    itw_op: limb.U64Pair           # [L, P, M]  w^{-i2·br(p)}   (row p)
    itw_qt: limb.U64Pair
    iwp_op: limb.U64Pair           # [L, P, P]  w_P^{-p·r}·P^{-1} (row p, col r)
    iwp_qt: limb.U64Pair
    cyc_op: limb.U64Pair           # [L, M] cyclic M-NTT stage tables
    cyc_qt: limb.U64Pair
    icyc_op: limb.U64Pair          # [L, M] inverse cyclic stage tables
    icyc_qt: limb.U64Pair
    invm_op: limb.U64Pair          # [L, 1] M^{-1}
    invm_qt: limb.U64Pair
    # all_to_all route (r3): replicated P-point DFT matrices consumed after
    # the transpose — wp2[p', p] = w_P^{p·br(p')} (fwd, rows in destination
    # order) and iwp2[i1, p] = w_P^{-i1·br(p)}·P^{-1} (inverse, columns in
    # source order)
    wp2_op: limb.U64Pair = ()      # [L, P, P]
    wp2_qt: limb.U64Pair = ()
    iwp2_op: limb.U64Pair = ()     # [L, P, P]
    iwp2_qt: limb.U64Pair = ()


jax.tree_util.register_pytree_node(
    FourStepTables,
    lambda t: (tuple(t[2:]), (t.log_n, t.shards)),
    lambda aux, children: FourStepTables(aux[0], aux[1], *children),
)


@functools.lru_cache(maxsize=None)
def _host_tables(log_n: int, q: int, P: int):
    """Exact host-side integer tables for one prime."""
    n = 1 << log_n
    M = n // P
    log_p = P.bit_length() - 1
    log_m = log_n - log_p
    psi = numth.try_minimal_primitive_root(2 * n, q)
    if psi is None:
        raise ValueError(f"modulus {q:#x} does not support NTT of size {n}")
    ipsi = numth.invert_uint_mod(psi, q)
    w = (psi * psi) % q
    iw = numth.invert_uint_mod(w, q)
    wp = pow(w, M, q)
    iwp = numth.invert_uint_mod(wp, q)
    inv_p = numth.invert_uint_mod(P, q)
    inv_m = numth.invert_uint_mod(M, q)

    psi_pow = [pow(psi, i, q) for i in range(n)]
    # inverse pre-twiddle: ψ^{-i} applied after the inverse four-step
    ipsi_pow = [pow(ipsi, i, q) for i in range(n)]

    br_p = [_bitrev(p, log_p) for p in range(P)]
    wp_rows = [[pow(wp, (i1 * br_p[p]) % P, q) for i1 in range(P)] for p in range(P)]
    tw_rows = [[pow(w, (i2 * br_p[p]) % n, q) for i2 in range(M)] for p in range(P)]
    itw_rows = [[pow(iw, (i2 * br_p[p]) % n, q) for i2 in range(M)] for p in range(P)]
    # column index is the *shard* index p' of the all_gather (shard p' holds
    # row r' = br(p')), so the weight for column p' is w_P^{-p·br(p')}/P
    iwp_rows = [[(pow(iwp, (p * br_p[pp]) % P, q) * inv_p) % q for pp in range(P)]
                for p in range(P)]
    # all_to_all-route matrices (replicated): rows of wp2 are ordered by the
    # DESTINATION shard p' (value row r = br(p')), columns by source shard
    wp2_rows = [[pow(wp, (i1 * br_p[pp]) % P, q) for i1 in range(P)]
                for pp in range(P)]
    iwp2_rows = [[(pow(iwp, (i1 * br_p[p]) % P, q) * inv_p) % q
                  for p in range(P)] for i1 in range(P)]

    # cyclic M-point stage tables, same layout the ops/ntt.py loops consume:
    # forward cyc[m+b] = w_M^{br_m(b)·M/(2m)}; inverse consumed sequentially
    # per stage s = log_m-1..1 as w_M^{-br_m(b)·M/(2m)}, last stage folds 1/M.
    wm = pow(w, P, q)
    iwm = numth.invert_uint_mod(wm, q)
    cyc = [1] * M
    icyc = [1] * M
    for s in range(log_m):
        m = 1 << s
        for b in range(m):
            cyc[m + b] = pow(wm, _bitrev(b, s) * (M // (2 * m)), q)
    offset = 1
    for s in range(log_m - 1, 0, -1):
        m = 1 << s
        for b in range(m):
            icyc[offset + b] = pow(iwm, _bitrev(b, s) * (M // (2 * m)), q)
        offset += m

    return dict(
        psi=psi_pow, ipsi=ipsi_pow, wp=wp_rows, tw=tw_rows, itw=itw_rows,
        iwp=iwp_rows, wp2=wp2_rows, iwp2=iwp2_rows, cyc=cyc, icyc=icyc,
        inv_m=inv_m,
    )


def build_fourstep_tables(log_n: int, moduli, num_shards: int) -> FourStepTables:
    P_ = int(num_shards)
    if P_ < 2 or (P_ & (P_ - 1)):
        raise ValueError("num_shards must be a power of two >= 2")
    n = 1 << log_n
    if P_ * 4 > n:
        raise ValueError("shard size must be >= 4 coefficients")
    qs = [int(m) for m in moduli]
    hosts = [_host_tables(log_n, q, P_) for q in qs]
    M = n // P_

    def tab(key, shape):
        return _shoup([h[key] for h in hosts], qs, shape)

    psi_op, psi_qt = tab("psi", (n,))
    ipsi_op, ipsi_qt = tab("ipsi", (n,))
    wp_op, wp_qt = tab("wp", (P_, P_))
    tw_op, tw_qt = tab("tw", (P_, M))
    itw_op, itw_qt = tab("itw", (P_, M))
    iwp_op, iwp_qt = tab("iwp", (P_, P_))
    wp2_op, wp2_qt = tab("wp2", (P_, P_))
    iwp2_op, iwp2_qt = tab("iwp2", (P_, P_))
    cyc_op, cyc_qt = tab("cyc", (M,))
    icyc_op, icyc_qt = tab("icyc", (M,))
    invm_op, invm_qt = _shoup([[h["inv_m"]] for h in hosts], qs, (1,))

    return FourStepTables(
        log_n=log_n, shards=P_, mc=make_mod_consts(qs),
        psi_op=psi_op, psi_qt=psi_qt, ipsi_op=ipsi_op, ipsi_qt=ipsi_qt,
        wp_op=wp_op, wp_qt=wp_qt, tw_op=tw_op, tw_qt=tw_qt,
        itw_op=itw_op, itw_qt=itw_qt, iwp_op=iwp_op, iwp_qt=iwp_qt,
        cyc_op=cyc_op, cyc_qt=cyc_qt, icyc_op=icyc_op, icyc_qt=icyc_qt,
        invm_op=invm_op, invm_qt=invm_qt,
        wp2_op=wp2_op, wp2_qt=wp2_qt, iwp2_op=iwp2_op, iwp2_qt=iwp2_qt,
    )


# ---------------------------------------------------------------------------
# Local cyclic M-point transforms (same butterfly loops as ops/ntt.py, with
# cyclic stage tables; fully reduced outputs)
# ---------------------------------------------------------------------------

def _cyclic_ntt(x, log_m, cyc_op, cyc_qt, mc):
    lo, hi = x
    m_total = 1 << log_m
    q3 = tuple(a[:, :, None] for a in mc.q)
    twoq3 = tuple(a[:, :, None] for a in mc.two_q)
    for s in range(log_m):
        m = 1 << s
        gap = m_total >> (s + 1)
        v_lo = _bview(lo, m, gap)
        v_hi = _bview(hi, m, gap)
        x0 = (v_lo[..., 0, :], v_hi[..., 0, :])
        x1 = (v_lo[..., 1, :], v_hi[..., 1, :])
        w, wq = _root_slice(cyc_op, cyc_qt, m, m)
        u = _guard(x0, twoq3)
        v = limb.mul_mod_shoup_lazy(x1, w, wq, q3)
        y0 = limb.add64(u, v)
        y1 = limb.sub64(limb.add64(u, twoq3), v)
        lo = jnp.stack([y0[0], y1[0]], axis=-2).reshape(lo.shape)
        hi = jnp.stack([y0[1], y1[1]], axis=-2).reshape(hi.shape)
    out = _guard((lo, hi), mc.two_q)
    return limb.cond_sub(out, mc.q)


def _cyclic_intt(x, log_m, icyc_op, icyc_qt, invm_op, invm_qt, mc):
    """Inverse cyclic M-NTT, bit-reversed in / natural out, 1/M folded into
    the last stage (both outputs: cyclic last twiddle is 1)."""
    lo, hi = x
    m_total = 1 << log_m
    q3 = tuple(a[:, :, None] for a in mc.q)
    twoq3 = tuple(a[:, :, None] for a in mc.two_q)
    offset = 1
    for s in range(log_m - 1, 0, -1):
        m = 1 << s
        gap = m_total >> (s + 1)
        v_lo = _bview(lo, m, gap)
        v_hi = _bview(hi, m, gap)
        u = (v_lo[..., 0, :], v_hi[..., 0, :])
        v = (v_lo[..., 1, :], v_hi[..., 1, :])
        w, wq = _root_slice(icyc_op, icyc_qt, offset, m)
        offset += m
        y0 = _guard(limb.add64(u, v), twoq3)
        y1 = limb.mul_mod_shoup_lazy(limb.sub64(limb.add64(u, twoq3), v), w, wq, q3)
        lo = jnp.stack([y0[0], y1[0]], axis=-2).reshape(lo.shape)
        hi = jnp.stack([y0[1], y1[1]], axis=-2).reshape(hi.shape)
    gap = m_total >> 1
    v_lo = lo.reshape(lo.shape[:-1] + (2, gap))
    v_hi = hi.reshape(hi.shape[:-1] + (2, gap))
    u = (v_lo[..., 0, :], v_hi[..., 0, :])
    v = (v_lo[..., 1, :], v_hi[..., 1, :])
    u = _guard(u, mc.two_q)
    y0 = limb.mul_mod_shoup_lazy(
        _guard(limb.add64(u, v), mc.two_q), invm_op, invm_qt, mc.q)
    y1 = limb.mul_mod_shoup_lazy(
        limb.sub64(limb.add64(u, mc.two_q), v), invm_op, invm_qt, mc.q)
    lo = jnp.concatenate([y0[0], y1[0]], axis=-1)
    hi = jnp.concatenate([y0[1], y1[1]], axis=-1)
    return limb.cond_sub((lo, hi), mc.q)


# ---------------------------------------------------------------------------
# shard_map kernels: local block shapes are [L, M] (+[p-row] table slices)
# ---------------------------------------------------------------------------

def _fwd_local(x_lo, x_hi, t: FourStepTables, axis: str):
    psi_op, psi_qt = t.psi_op, t.psi_qt
    wp_op, wp_qt = t.wp_op, t.wp_qt
    tw_op, tw_qt = t.tw_op, t.tw_qt
    mc = t.mc
    P_ = t.shards
    log_m = t.log_n - (P_.bit_length() - 1)
    # step 1: b = a·ψ^i (local slice of ψ powers)
    b = limb.mul_mod_shoup((x_lo, x_hi), (psi_op[0], psi_op[1]),
                           (psi_qt[0], psi_qt[1]), mc.q)
    # step 2: one all_gather over the shard axis -> [P, L, M]
    g_lo = jax.lax.all_gather(b[0], axis)
    g_hi = jax.lax.all_gather(b[1], axis)
    # step 3: P-point DFT across shards at this shard's row r = br(p):
    # c[i2] = Σ_{i1} g[i1]·w_P^{i1·r}; wp row slice is [1(L?), ...] -> [L,1]
    c = None
    for i1 in range(P_):
        term = limb.mul_mod_shoup(
            (g_lo[i1], g_hi[i1]),
            (wp_op[0][:, 0, i1, None], wp_op[1][:, 0, i1, None]),
            (wp_qt[0][:, 0, i1, None], wp_qt[1][:, 0, i1, None]),
            mc.q,
        )
        c = term if c is None else limb.add_mod(c, term, mc.q)
    # step 4: local twiddle w^{i2·r}
    d = limb.mul_mod_shoup(
        c, (tw_op[0][:, 0], tw_op[1][:, 0]), (tw_qt[0][:, 0], tw_qt[1][:, 0]),
        mc.q,
    )
    # step 5: local cyclic M-NTT
    out = _cyclic_ntt(d, log_m, t.cyc_op, t.cyc_qt, mc)
    return out[0], out[1]


def _inv_local(x_lo, x_hi, t: FourStepTables, axis: str):
    ipsi_op, ipsi_qt = t.ipsi_op, t.ipsi_qt
    iwp_op, iwp_qt = t.iwp_op, t.iwp_qt
    itw_op, itw_qt = t.itw_op, t.itw_qt
    mc = t.mc
    P_ = t.shards
    log_m = t.log_n - (P_.bit_length() - 1)
    # inverse of step 5: local inverse cyclic M-NTT (1/M folded)
    e = _cyclic_intt((x_lo, x_hi), log_m, t.icyc_op, t.icyc_qt,
                     t.invm_op, t.invm_qt, mc)
    # inverse of step 4: untwiddle w^{-i2·r}
    e = limb.mul_mod_shoup(
        e, (itw_op[0][:, 0], itw_op[1][:, 0]), (itw_qt[0][:, 0], itw_qt[1][:, 0]),
        mc.q,
    )
    # inverse of step 3: all_gather e, combine with w_P^{-p·r}·P^{-1}
    g_lo = jax.lax.all_gather(e[0], axis)
    g_hi = jax.lax.all_gather(e[1], axis)
    b = None
    for r in range(P_):
        term = limb.mul_mod_shoup(
            (g_lo[r], g_hi[r]),
            (iwp_op[0][:, 0, r, None], iwp_op[1][:, 0, r, None]),
            (iwp_qt[0][:, 0, r, None], iwp_qt[1][:, 0, r, None]),
            mc.q,
        )
        b = term if b is None else limb.add_mod(b, term, mc.q)
    # inverse of step 1: a = b·ψ^{-i}
    out = limb.mul_mod_shoup(b, (ipsi_op[0], ipsi_op[1]),
                             (ipsi_qt[0], ipsi_qt[1]), mc.q)
    return out[0], out[1]


def ntt_forward_local(x: limb.U64Pair, t: FourStepTables) -> limb.U64Pair:
    """SINGLE-CHIP four-step forward NTT: the shard axis becomes a leading
    batch axis and the all_gather becomes a reshape — no collectives
    (VERDICT r3 item 6). The point at huge n (131072): the monolithic
    kernel's stage working set exceeds VMEM, but this route runs P batched
    M-point sub-NTTs (M = n/P VMEM-resident) plus O(n·P) butterflies.
    Bit-identical to ops/ntt.py (same fully-reduced steps as the sharded
    route, which is bit-exactness-tested against the single-chip kernel)."""
    lo, hi = x
    L = lo.shape[0]
    P_ = t.shards
    n = 1 << t.log_n
    M = n // P_
    log_m = t.log_n - (P_.bit_length() - 1)
    mc = t.mc

    def split(a):
        return jnp.moveaxis(a.reshape(a.shape[0], P_, M), 1, 0)  # [P, L, M]

    xs = (split(lo), split(hi))
    psi_s = (split(t.psi_op[0]), split(t.psi_op[1]))
    psi_q = (split(t.psi_qt[0]), split(t.psi_qt[1]))
    b = limb.mul_mod_shoup(xs, psi_s, psi_q, mc.q)
    # P-point DFT across the (now batched) shard axis
    c_lo, c_hi = [], []
    for p in range(P_):
        acc = None
        for i1 in range(P_):
            term = limb.mul_mod_shoup(
                (b[0][i1], b[1][i1]),
                (t.wp_op[0][:, p, i1, None], t.wp_op[1][:, p, i1, None]),
                (t.wp_qt[0][:, p, i1, None], t.wp_qt[1][:, p, i1, None]),
                mc.q,
            )
            acc = term if acc is None else limb.add_mod(acc, term, mc.q)
        c_lo.append(acc[0])
        c_hi.append(acc[1])
    c = (jnp.stack(c_lo), jnp.stack(c_hi))                      # [P, L, M]
    tw_s = (jnp.moveaxis(t.tw_op[0], 1, 0), jnp.moveaxis(t.tw_op[1], 1, 0))
    tw_q = (jnp.moveaxis(t.tw_qt[0], 1, 0), jnp.moveaxis(t.tw_qt[1], 1, 0))
    d = limb.mul_mod_shoup(c, tw_s, tw_q, mc.q)
    out = jax.vmap(
        lambda pair: _cyclic_ntt(pair, log_m, t.cyc_op, t.cyc_qt, mc))(d)

    def join(a):
        return jnp.moveaxis(a, 0, 1).reshape(L, n)

    return join(out[0]), join(out[1])


def ntt_inverse_local(x: limb.U64Pair, t: FourStepTables) -> limb.U64Pair:
    """Single-chip four-step inverse NTT (see ntt_forward_local)."""
    lo, hi = x
    L = lo.shape[0]
    P_ = t.shards
    n = 1 << t.log_n
    M = n // P_
    log_m = t.log_n - (P_.bit_length() - 1)
    mc = t.mc

    def split(a):
        return jnp.moveaxis(a.reshape(a.shape[0], P_, M), 1, 0)

    xs = (split(lo), split(hi))
    e = jax.vmap(
        lambda pair: _cyclic_intt(pair, log_m, t.icyc_op, t.icyc_qt,
                                  t.invm_op, t.invm_qt, mc))(xs)
    itw_s = (jnp.moveaxis(t.itw_op[0], 1, 0), jnp.moveaxis(t.itw_op[1], 1, 0))
    itw_q = (jnp.moveaxis(t.itw_qt[0], 1, 0), jnp.moveaxis(t.itw_qt[1], 1, 0))
    e = limb.mul_mod_shoup(e, itw_s, itw_q, mc.q)
    b_lo, b_hi = [], []
    for p in range(P_):
        acc = None
        for r in range(P_):
            term = limb.mul_mod_shoup(
                (e[0][r], e[1][r]),
                (t.iwp_op[0][:, p, r, None], t.iwp_op[1][:, p, r, None]),
                (t.iwp_qt[0][:, p, r, None], t.iwp_qt[1][:, p, r, None]),
                mc.q,
            )
            acc = term if acc is None else limb.add_mod(acc, term, mc.q)
        b_lo.append(acc[0])
        b_hi.append(acc[1])
    b = (jnp.stack(b_lo), jnp.stack(b_hi))
    ipsi_s = (split(t.ipsi_op[0]), split(t.ipsi_op[1]))
    ipsi_q = (split(t.ipsi_qt[0]), split(t.ipsi_qt[1]))
    out = limb.mul_mod_shoup(b, ipsi_s, ipsi_q, mc.q)

    def join(a):
        return jnp.moveaxis(a, 0, 1).reshape(L, n)

    return join(out[0]), join(out[1])


def _a2a_chunks(pair, P_, axis):
    """Transpose [L, M] shard-local pairs: chunk j of shard p lands on
    shard j as row p of a [P, L, M/P] tensor (one tiled all_to_all)."""
    def one(a):
        Lr, M = a.shape
        xr = jnp.moveaxis(a.reshape(Lr, P_, M // P_), 1, 0)
        return jax.lax.all_to_all(xr, axis, 0, 0, tiled=True)
    return one(pair[0]), one(pair[1])


def _a2a_unchunks(pair, axis):
    """Inverse layout move: [P, L, K] rows (row p' destined for shard p')
    -> shard-local [L, M] with chunk j from source shard j."""
    def one(a):
        y = jax.lax.all_to_all(a, axis, 0, 0, tiled=True)   # [P, L, K]
        P_, Lr, K = y.shape
        return jnp.moveaxis(y, 0, 1).reshape(Lr, P_ * K)
    return one(pair[0]), one(pair[1])


def _fwd_local_a2a(x_lo, x_hi, t: FourStepTables, axis: str):
    """all_to_all route: same math as _fwd_local, but the P-point DFT runs
    after a transpose so per-shard communication is O(n/P), not O(n) —
    two tiled all_to_alls instead of one all_gather."""
    mc = t.mc
    P_ = t.shards
    log_m = t.log_n - (P_.bit_length() - 1)
    b = limb.mul_mod_shoup((x_lo, x_hi), (t.psi_op[0], t.psi_op[1]),
                           (t.psi_qt[0], t.psi_qt[1]), mc.q)
    # transpose #1: this shard now holds ALL i1 rows for its i2 chunk
    recv = _a2a_chunks(b, P_, axis)                  # [P, L, K]
    wp2_op, wp2_qt = t.wp2_op, t.wp2_qt              # [L, P, P] replicated
    rows = []
    for pp in range(P_):
        c = None
        for p in range(P_):
            term = limb.mul_mod_shoup(
                (recv[0][p], recv[1][p]),
                (wp2_op[0][:, pp, p, None], wp2_op[1][:, pp, p, None]),
                (wp2_qt[0][:, pp, p, None], wp2_qt[1][:, pp, p, None]),
                mc.q,
            )
            c = term if c is None else limb.add_mod(c, term, mc.q)
        rows.append(c)
    c_lo = jnp.stack([r[0] for r in rows])
    c_hi = jnp.stack([r[1] for r in rows])
    # transpose #2: row p' goes home to shard p' (which needs r = br(p'))
    d_in = _a2a_unchunks((c_lo, c_hi), axis)         # [L, M]
    d = limb.mul_mod_shoup(
        d_in, (t.tw_op[0][:, 0], t.tw_op[1][:, 0]),
        (t.tw_qt[0][:, 0], t.tw_qt[1][:, 0]), mc.q,
    )
    out = _cyclic_ntt(d, log_m, t.cyc_op, t.cyc_qt, mc)
    return out[0], out[1]


def _inv_local_a2a(x_lo, x_hi, t: FourStepTables, axis: str):
    mc = t.mc
    P_ = t.shards
    log_m = t.log_n - (P_.bit_length() - 1)
    e = _cyclic_intt((x_lo, x_hi), log_m, t.icyc_op, t.icyc_qt,
                     t.invm_op, t.invm_qt, mc)
    e = limb.mul_mod_shoup(
        e, (t.itw_op[0][:, 0], t.itw_op[1][:, 0]),
        (t.itw_qt[0][:, 0], t.itw_qt[1][:, 0]), mc.q,
    )
    recv = _a2a_chunks(e, P_, axis)                  # recv[p] = e_{br(p)}[my i2]
    iwp2_op, iwp2_qt = t.iwp2_op, t.iwp2_qt
    rows = []
    for i1 in range(P_):
        acc = None
        for p in range(P_):
            term = limb.mul_mod_shoup(
                (recv[0][p], recv[1][p]),
                (iwp2_op[0][:, i1, p, None], iwp2_op[1][:, i1, p, None]),
                (iwp2_qt[0][:, i1, p, None], iwp2_qt[1][:, i1, p, None]),
                mc.q,
            )
            acc = term if acc is None else limb.add_mod(acc, term, mc.q)
        rows.append(acc)
    b_lo = jnp.stack([r[0] for r in rows])
    b_hi = jnp.stack([r[1] for r in rows])
    b = _a2a_unchunks((b_lo, b_hi), axis)            # [L, M]
    out = limb.mul_mod_shoup(b, (t.ipsi_op[0], t.ipsi_op[1]),
                             (t.ipsi_qt[0], t.ipsi_qt[1]), mc.q)
    return out[0], out[1]


def _table_specs(axis: str, log_n: int, shards: int) -> FourStepTables:
    """Partition-spec prefix pytree matching FourStepTables: ψ tables are
    sharded with the coefficient axis, per-shard row tables over their row
    axis, cyclic sub-NTT tables and modulus constants replicated."""
    rep = P(None, None)             # [L, *] replicated
    n_spec = P(None, axis)          # [L, n] sharded like the data
    row = P(None, axis, None)       # [L, P, *]: row p -> shard p
    rep3 = P(None, None, None)      # [L, P, P] replicated (a2a matrices)
    return FourStepTables(
        log_n=log_n, shards=shards, mc=rep,
        psi_op=n_spec, psi_qt=n_spec, ipsi_op=n_spec, ipsi_qt=n_spec,
        wp_op=row, wp_qt=row, tw_op=row, tw_qt=row,
        itw_op=row, itw_qt=row, iwp_op=row, iwp_qt=row,
        cyc_op=rep, cyc_qt=rep, icyc_op=rep, icyc_qt=rep,
        invm_op=rep, invm_qt=rep,
        wp2_op=rep3, wp2_qt=rep3, iwp2_op=rep3, iwp2_qt=rep3,
    )


@functools.lru_cache(maxsize=None)
def _jitted(mesh: Mesh, axis: str, log_n: int, shards: int, inverse: bool,
            comm: str):
    """Compiled sharded transform, cached per (mesh, axis, size, comm).
    Tables ride as pytree arguments so one executable serves any tower."""
    if comm == "a2a":
        local = _inv_local_a2a if inverse else _fwd_local_a2a
    else:
        local = _inv_local if inverse else _fwd_local
    x_spec = P(None, axis)
    fn = shard_map(
        functools.partial(local, axis=axis),
        mesh=mesh,
        in_specs=(x_spec, x_spec, _table_specs(axis, log_n, shards)),
        out_specs=(x_spec, x_spec),
    )
    return jax.jit(fn)


def _pick_comm(t: FourStepTables, comm: str) -> str:
    """'a2a' (default: two tiled all_to_alls, O(n/P) bytes per shard)
    unless the shard is too small to re-split (M < P) or the tables predate
    the a2a matrices; 'gather' forces the one-all_gather O(n) route."""
    if comm == "gather":
        return "gather"
    n = 1 << t.log_n
    M = n // t.shards
    if M % t.shards or not isinstance(t.wp2_op, tuple) or not t.wp2_op:
        return "gather"
    return "a2a"


def ntt_forward_sharded(x: limb.U64Pair, t: FourStepTables, mesh: Mesh,
                        axis: str = "sp", comm: str = "a2a") -> limb.U64Pair:
    """Forward negacyclic NTT of [L, N] u64 tensors whose coefficient axis
    is sharded P ways over `axis`. Natural order in, SEAL bit-reversed order
    out, fully reduced — bit-identical to ops/ntt.ntt_forward. `comm`
    selects the transpose route ('a2a', default — per-shard bytes O(n/P))
    or the legacy one-all_gather route ('gather', O(n))."""
    return _jitted(mesh, axis, t.log_n, t.shards, False,
                   _pick_comm(t, comm))(x[0], x[1], t)


def ntt_inverse_sharded(x: limb.U64Pair, t: FourStepTables, mesh: Mesh,
                        axis: str = "sp", comm: str = "a2a") -> limb.U64Pair:
    """Inverse negacyclic NTT, bit-reversed in / natural out, fully reduced
    — bit-identical to ops/ntt.ntt_inverse."""
    return _jitted(mesh, axis, t.log_n, t.shards, True,
                   _pick_comm(t, comm))(x[0], x[1], t)
