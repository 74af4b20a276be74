"""Galois automorphisms x -> x^elt on RNS polys.

Parity: seal::util::GaloisTool (/root/reference/native/src/seal/util/
galois.{h,cpp}): NTT-domain permutation tables (generate_table_ntt :20-51),
step <-> element map with generator 3 (get_elt_from_step :53-95),
get_elts_all :106-130, coefficient-domain automorphism with sign fix
(apply_galois :148-190).

TPU design: automorphisms are single gathers. The NTT-domain permutation is
precomputed per Galois element as an index vector; the coefficient-domain
map is a (gather, negate-mask) pair. Both cached per element.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from seal_tpu.ops import limb
from seal_tpu.ops.modring import ModConsts
from seal_tpu.utils import numth

GENERATOR = 3

# Cached-jit automorphism gathers, keyed per backend (jit re-traces per
# shape). Eager fancy-indexing with a 16K index vector pays ~0.5 s of pure
# Python index preprocessing per call (profiled: _index_to_gather dominates
# multi-element galois keygen); one executable removes it. Bit-identical:
# the same gather runs traced instead of dispatched.
_gather_jit_cache: dict = {}


def _platform() -> str:
    import jax

    dd = jax.config.jax_default_device
    return (dd if isinstance(dd, str) else dd.platform) if dd is not None \
        else jax.default_backend()


def _reverse_bits_vec(v: np.ndarray, bit_count: int) -> np.ndarray:
    """Vectorized numth.reverse_bits over a u64 numpy array."""
    v = v.astype(np.uint64)
    out = np.zeros_like(v)
    for _ in range(bit_count):
        out = (out << np.uint64(1)) | (v & np.uint64(1))
        v = v >> np.uint64(1)
    return out


def _gather_jit():
    import jax

    key = ("ntt", _platform())
    fn = _gather_jit_cache.get(key)
    if fn is None:
        fn = jax.jit(lambda lo, hi, tab: (lo[..., tab], hi[..., tab]))
        _gather_jit_cache[key] = fn
    return fn


def _coeff_apply_jit():
    import jax

    key = ("coeff", _platform())
    fn = _gather_jit_cache.get(key)
    if fn is None:
        def body(lo, hi, src, neg, q):
            g = (lo[..., src], hi[..., src])
            negated = limb.neg_mod(g, q)
            return limb.select64(neg, negated, g)

        fn = jax.jit(body)
        _gather_jit_cache[key] = fn
    return fn


class GaloisTool:
    def __init__(self, coeff_count_power: int):
        self.coeff_count_power = coeff_count_power
        self.coeff_count = 1 << coeff_count_power
        self._ntt_tables: dict[int, jnp.ndarray] = {}
        self._coeff_tables: dict[int, tuple] = {}

    # -- step <-> element ------------------------------------------------------

    def get_elt_from_step(self, step: int) -> int:
        n = self.coeff_count
        m = 2 * n
        if step == 0:
            return m - 1
        sign = step < 0
        pos = abs(step)
        if pos >= (n >> 1):
            raise ValueError("step count too large")
        if sign:
            step = (n >> 1) - pos
        else:
            step = pos
        elt = 1
        for _ in range(step):
            elt = (elt * GENERATOR) % m
        return elt

    def get_elts_from_steps(self, steps) -> list[int]:
        return [self.get_elt_from_step(s) for s in steps]

    def get_elts_all(self) -> list[int]:
        m = 2 * self.coeff_count
        elts = [m - 1]
        pos = GENERATOR
        neg = numth.invert_uint_mod(GENERATOR, m)
        for _ in range(self.coeff_count_power - 1):
            elts.append(pos)
            pos = (pos * pos) % m
            elts.append(neg)
            neg = (neg * neg) % m
        return elts

    # -- permutation tables ------------------------------------------------------

    def _ntt_table(self, galois_elt: int) -> jnp.ndarray:
        tab = self._ntt_tables.get(galois_elt)
        if tab is None:
            n = self.coeff_count
            logn = self.coeff_count_power
            # vectorized bit reversals (the scalar loop cost ~0.1 s per NEW
            # element at n=16384 — 2n Python reverse_bits calls)
            i = np.arange(n, 2 * n, dtype=np.uint64)
            reversed_i = _reverse_bits_vec(i, logn + 1)
            index_raw = ((np.uint64(galois_elt) * reversed_i) >> np.uint64(1)) \
                & np.uint64(n - 1)
            # cache as NUMPY: a jnp array created while tracing would be a
            # tracer and leak out of the jit scope on reuse
            tab = _reverse_bits_vec(index_raw, logn).astype(np.int32)
            self._ntt_tables[galois_elt] = tab
        return tab

    def _coeff_table(self, galois_elt: int):
        tab = self._coeff_tables.get(galois_elt)
        if tab is None:
            n = self.coeff_count
            # out[index(i)] = ±in[i]  ->  invert to gather form:
            # out[k] = sign(src[k]) * in[src[k]]
            src = np.empty(n, dtype=np.int32)
            neg = np.empty(n, dtype=bool)
            index_raw = 0
            for i in range(n):
                index = index_raw & (n - 1)
                src[index] = i
                neg[index] = bool((index_raw >> self.coeff_count_power) & 1)
                index_raw += galois_elt
            tab = (src, neg)  # numpy, not jnp: see _ntt_table cache note
            self._coeff_tables[galois_elt] = tab
        return tab

    # -- Clos-routed MXU permutation (r2) ----------------------------------------
    #
    # Round-1 recorded rotations as gather-bound (~0.5-1.5 ms per 16K
    # permutation); that was a dispatch-timing artifact (BASELINE.md r2) —
    # the honest differential puts XLA's static-index gather at ~21 µs per
    # [8, 16384] tower and this MXU route at ~23 µs, i.e. parity. The route
    # is kept as a tested option (config.galois_permute="matmul"): any
    # permutation of an [R, C=128] tile factors into within-row, within-
    # column, within-row stages (3-stage Clos / Hall's theorem; host-side
    # Euler-split edge coloring), each an exact batch of one-hot matmuls
    # over 8-bit pieces.

    def _matmul_tables(self, galois_elt: int):
        key = ("mm", galois_elt)
        tab = self._ntt_tables.get(key)
        if tab is None:
            g = self._ntt_table(galois_elt)       # out[p] = in[g[p]]
            n = self.coeff_count
            C = min(n, 128)
            R = n // C
            tab = _route_permutation(np.asarray(g), R, C)
            self._ntt_tables[key] = tab
        return tab

    def apply_galois_ntt_matmul(self, x: limb.U64Pair, galois_elt: int) -> limb.U64Pair:
        """NTT-domain automorphism as three exact one-hot MXU matmuls."""
        self._validate(galois_elt)
        M1, M2, M3 = self._matmul_tables(galois_elt)
        n = self.coeff_count
        C = min(n, 128)
        R = n // C
        lo, hi = x
        lead = lo.shape[:-1]
        lo4 = lo.reshape(lead + (R, C))
        hi4 = hi.reshape(lead + (R, C))
        # 8-bit pieces as f32 operands: exact even through the MXU's
        # single-pass-bf16 default f32 matmul (values ≤ 255, one-hot weights)
        pieces = [(lo4 >> (8 * k)) & jnp.uint32(0xFF) for k in range(4)]
        pieces += [(hi4 >> (8 * k)) & jnp.uint32(0xFF) for k in range(4)]
        p = jnp.stack([q.astype(jnp.int32).astype(jnp.float32) for q in pieces])

        kio = jnp.arange(C, dtype=jnp.int32)
        O1 = (jnp.asarray(M1)[:, :, None] == kio[None, None, :]).astype(jnp.float32)
        sio = jnp.arange(R, dtype=jnp.int32)
        O2 = (jnp.asarray(M2)[:, :, None] == sio[None, None, :]).astype(jnp.float32)
        O3 = (jnp.asarray(M3)[:, :, None] == kio[None, None, :]).astype(jnp.float32)

        y = jnp.einsum("...rc,rck->...rk", p, O1,
                       preferred_element_type=jnp.float32)
        y = jnp.einsum("...rk,krs->...sk", y, O2,
                       preferred_element_type=jnp.float32)
        y = jnp.einsum("...sk,skd->...sd", y, O3,
                       preferred_element_type=jnp.float32)
        q8 = y.astype(jnp.int32).astype(jnp.uint32)
        out_lo = q8[0] | (q8[1] << 8) | (q8[2] << 16) | (q8[3] << 24)
        out_hi = q8[4] | (q8[5] << 8) | (q8[6] << 16) | (q8[7] << 24)
        return out_lo.reshape(lo.shape), out_hi.reshape(hi.shape)

    # -- application ----------------------------------------------------------------

    def apply_galois_ntt(self, x: limb.U64Pair, galois_elt: int) -> limb.U64Pair:
        """NTT-domain automorphism (galois.cpp:192+): a gather on CPU, the
        Clos-routed MXU matmul on TPU backends (config-gated)."""
        self._validate(galois_elt)
        from seal_tpu.config import galois_matmul_enabled

        if galois_matmul_enabled(self.coeff_count):
            return self.apply_galois_ntt_matmul(x, galois_elt)
        tab = self._ntt_table(galois_elt)
        import jax

        if isinstance(x[0], jax.core.Tracer):
            # inside an enclosing trace the table must stay a compile-time
            # constant: XLA's static-index gather is the fast TPU path
            # (21 µs per [8,16384] permutation, BASELINE.md r2)
            return x[0][..., tab], x[1][..., tab]
        return _gather_jit()(x[0], x[1], tab)

    def apply_galois_ntt_np(self, x: np.ndarray, galois_elt: int) -> np.ndarray:
        """NTT-domain automorphism on a host numpy u64 array (native keygen
        path) — same cached permutation table as the device gather."""
        self._validate(galois_elt)
        return np.ascontiguousarray(x[..., self._ntt_table(galois_elt)])

    def apply_galois(self, x: limb.U64Pair, galois_elt: int, mc: ModConsts) -> limb.U64Pair:
        """Coefficient-domain automorphism with negacyclic sign fix
        (galois.cpp:148-190)."""
        self._validate(galois_elt)
        src, neg = self._coeff_table(galois_elt)
        import jax

        if isinstance(x[0], jax.core.Tracer):
            g = (x[0][..., src], x[1][..., src])
            negated = limb.neg_mod(g, mc.q)
            return limb.select64(neg, negated, g)
        return _coeff_apply_jit()(x[0], x[1], src, neg, mc.q)

    def _validate(self, galois_elt: int):
        if not (galois_elt & 1) or galois_elt >= 2 * self.coeff_count:
            raise ValueError("Galois element is not valid")

    @staticmethod
    def get_index_from_elt(galois_elt: int) -> int:
        return (galois_elt - 1) >> 1


# ---------------------------------------------------------------------------
# Clos routing: decompose an arbitrary [R*C] permutation into
# row-perm ∘ column-perm ∘ row-perm via Euler-split edge coloring
# ---------------------------------------------------------------------------

def _euler_split(edges, R):
    """Split a bipartite multigraph (R left/right vertices, even regular
    degree) into two half-degree edge sets by alternating edges along
    closed trails. Returns two lists of edge ids."""
    adj = [[] for _ in range(2 * R)]
    for eid, (u, v) in enumerate(edges):
        adj[u].append((R + v, eid))
        adj[R + v].append((u, eid))
    ptr = [0] * (2 * R)
    used = [False] * len(edges)
    A, B = [], []
    for start in range(2 * R):
        while True:
            lst = adj[start]
            while ptr[start] < len(lst) and used[lst[ptr[start]][1]]:
                ptr[start] += 1
            if ptr[start] >= len(lst):
                break
            vtx, parity = start, 0
            while True:
                lv = adj[vtx]
                while ptr[vtx] < len(lv) and used[lv[ptr[vtx]][1]]:
                    ptr[vtx] += 1
                if ptr[vtx] >= len(lv):
                    break  # trail closed back at `start` (degrees even)
                nxt, eid = lv[ptr[vtx]]
                used[eid] = True
                (A if parity == 0 else B).append(eid)
                parity ^= 1
                vtx = nxt
    return A, B


def _edge_coloring(edges, R, C):
    """Color a C-regular bipartite multigraph with C colors (C a power of
    two) so each color class is a perfect matching. Returns color per edge."""
    colors = np.zeros(len(edges), dtype=np.int32)
    groups = [list(range(len(edges)))]
    width = C
    while width > 1:
        nxt = []
        for gidx, group in enumerate(groups):
            sub = [edges[e] for e in group]
            A, B = _euler_split(sub, R)
            nxt.append([group[i] for i in A])
            nxt.append([group[i] for i in B])
        groups = nxt
        width >>= 1
    for color, group in enumerate(groups):
        for e in group:
            colors[e] = color
    return colors


def _route_permutation(g: np.ndarray, R: int, C: int):
    """Route out[p] = in[g[p]] over an [R, C] tile as three stage index
    maps: M1[r_src, c_src] = intermediate lane k;
    M2[k, r_src] = r_dst; M3[r_dst, k] = c_dst."""
    n = R * C
    src_r = g // C
    src_c = g % C
    dst_r = np.arange(n) // C
    dst_c = np.arange(n) % C
    edges = list(zip(src_r.tolist(), dst_r.tolist()))
    colors = _edge_coloring(edges, R, C)
    M1 = np.zeros((R, C), dtype=np.int32)
    M2 = np.zeros((C, R), dtype=np.int32)
    M3 = np.zeros((R, C), dtype=np.int32)
    M1[src_r, src_c] = colors
    M2[colors, src_r] = dst_r
    M3[dst_r, colors] = dst_c
    return M1, M2, M3
