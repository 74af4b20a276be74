"""Host-side native polynomial ops for keygen/encryption (numpy u64 arrays).

Wraps poly_native.cpp. One `NativePolyOps` is cached per ContextData; its
tables are numpy mirrors of the level's NTTDeviceTables (no extra exact-int
work). All methods operate on contiguous np.uint64 [L_sub, n] arrays using
the first L_sub tower rows; results are value-identical to the JAX path
(ops/ntt.py, ops/limb.py), which remains the fallback and cross-check.
"""

from __future__ import annotations

import ctypes

import numpy as np

from seal_tpu import native

_U64P = ctypes.POINTER(ctypes.c_uint64)
_I64P = ctypes.POINTER(ctypes.c_int64)


def _p(arr: np.ndarray):
    return arr.ctypes.data_as(_U64P)


def _pi64(arr: np.ndarray):
    return arr.ctypes.data_as(_I64P)


def _host_u64(pair) -> np.ndarray:
    lo = np.asarray(pair[0], dtype=np.uint64)
    hi = np.asarray(pair[1], dtype=np.uint64)
    return np.ascontiguousarray(lo | (hi << np.uint64(32)))


class NativePolyOps:
    """Native NTT + modular primitives for one chain level's tower."""

    def __init__(self, ntt_tables):
        self.lib = native.get_lib()
        self.available = (
            self.lib is not None and hasattr(self.lib, "sealtpu_ntt_forward"))
        if not self.available:
            return
        t = ntt_tables
        self.log_n = t.log_n
        self.n = 1 << t.log_n
        self.q = _host_u64(t.mc.q).reshape(-1)
        self.r0 = _host_u64(t.mc.ratio0).reshape(-1)
        self.r1 = _host_u64(t.mc.ratio1).reshape(-1)
        self.L = len(self.q)
        self.fwd_op = _host_u64(t.fwd_op)
        self.fwd_qt = _host_u64(t.fwd_qt)
        self.inv_op = _host_u64(t.inv_op)
        self.inv_qt = _host_u64(t.inv_qt)
        self.inv_n_op = _host_u64(t.inv_n_op).reshape(-1)
        self.inv_n_qt = _host_u64(t.inv_n_qt).reshape(-1)
        self.last_op = _host_u64(t.last_op).reshape(-1)
        self.last_qt = _host_u64(t.last_qt).reshape(-1)
        # cached row-0 pointers: ctypes data_as costs ~2 us apiece and the
        # hot host paths (encode/encrypt/decrypt) issue 6-10 per call (r4)
        self._ptr0 = {
            name: _p(getattr(self, name))
            for name in ("fwd_op", "fwd_qt", "inv_op", "inv_qt", "inv_n_op",
                         "inv_n_qt", "last_op", "last_qt", "q", "r0", "r1")
        }

    def _tp(self, name, row0=0):
        if row0 == 0:
            return self._ptr0[name]
        return _p(getattr(self, name)[row0:])

    def _rows(self, L_sub: int):
        if L_sub > self.L:
            raise ValueError("more rows than the tower holds")
        return L_sub

    def ntt_forward(self, x: np.ndarray, lazy: bool = False,
                    row0: int = 0) -> np.ndarray:
        """In-place forward negacyclic NTT over [L_sub, n] u64, using tower
        rows [row0, row0 + L_sub)."""
        L = self._rows(row0 + x.shape[0]) - row0
        assert x.flags.c_contiguous and x.dtype == np.uint64
        self.lib.sealtpu_ntt_forward(
            _p(x), L, self.log_n, self._tp("fwd_op", row0),
            self._tp("fwd_qt", row0), self._tp("q", row0), int(lazy))
        return x

    def ntt_inverse(self, x: np.ndarray, lazy: bool = False,
                    row0: int = 0) -> np.ndarray:
        L = self._rows(row0 + x.shape[0]) - row0
        assert x.flags.c_contiguous and x.dtype == np.uint64
        self.lib.sealtpu_ntt_inverse(
            _p(x), L, self.log_n, self._tp("inv_op", row0),
            self._tp("inv_qt", row0), self._tp("inv_n_op", row0),
            self._tp("inv_n_qt", row0), self._tp("last_op", row0),
            self._tp("last_qt", row0), self._tp("q", row0), int(lazy))
        return x

    def phase2(self, c0: np.ndarray, c1: np.ndarray, sk_ntt: np.ndarray,
               ntt_form: bool) -> np.ndarray:
        """Fused size-2 decrypt phase: INTT(NTT(c1)·s) + c0 in one native
        call (decryptor.cpp:126/249). Inputs are read-only."""
        L = c0.shape[0]
        out = np.empty((L, self.n), dtype=np.uint64)
        tp = self._ptr0
        self.lib.sealtpu_phase2(
            _p(c0), _p(c1), _p(sk_ntt), L, self.n, self.log_n,
            tp["fwd_op"], tp["fwd_qt"], tp["inv_op"], tp["inv_qt"],
            tp["inv_n_op"], tp["inv_n_qt"], tp["last_op"], tp["last_qt"],
            tp["q"], tp["r0"], tp["r1"], int(ntt_form), _p(out))
        return out

    def rescale_ntt(self, x: np.ndarray) -> np.ndarray:
        """Divide-and-round by the tower's LAST prime row, NTT domain
        (ops/rns.py divide_and_round_q_last_ntt / rns.cpp:830-901 parity):
        [L, N] NTT -> [L-1, N] NTT, value-identical to the JAX path."""
        from seal_tpu.utils import numth

        L = x.shape[0]
        q = [int(v) for v in self.q[:L]]
        last = np.ascontiguousarray(x[L - 1:]).copy()
        self.ntt_inverse(last, row0=L - 1)
        half = q[-1] >> 1
        lastv = last[0] + np.uint64(half)
        lastv = np.where(lastv >= np.uint64(q[-1]),
                         lastv - np.uint64(q[-1]), lastv)
        keep_q = np.asarray(q[:-1], dtype=np.uint64)
        temp = lastv[None, :] % keep_q[:, None]
        half_mod = np.asarray([half % qi for qi in q[:-1]], dtype=np.uint64)
        temp = np.ascontiguousarray(temp + (keep_q - half_mod)[:, None])
        self.ntt_forward(temp, lazy=True)                 # < 4q
        diff = np.ascontiguousarray(
            x[:L - 1] + (keep_q << np.uint64(2))[:, None] - temp)
        inv = [numth.invert_uint_mod(q[-1], qi) for qi in q[:-1]]
        _mul_scalar_rows(self.lib, diff, inv, q[:-1])
        return diff

    def rescale_coeff(self, x: np.ndarray) -> np.ndarray:
        """Divide-and-round by the last prime row, coefficient domain
        (ops/rns.py divide_and_round_q_last / rns.cpp:789-828 parity)."""
        from seal_tpu.utils import numth

        L = x.shape[0]
        q = [int(v) for v in self.q[:L]]
        half = q[-1] >> 1
        lastv = x[L - 1] + np.uint64(half)
        lastv = np.where(lastv >= np.uint64(q[-1]),
                         lastv - np.uint64(q[-1]), lastv)
        keep_q = np.asarray(q[:-1], dtype=np.uint64)
        temp = lastv[None, :] % keep_q[:, None]
        half_mod = np.asarray([half % qi for qi in q[:-1]], dtype=np.uint64)
        temp = (temp + (keep_q - half_mod)[:, None]) % keep_q[:, None]
        diff = np.ascontiguousarray(
            (x[:L - 1] + keep_q[:, None] - temp) % keep_q[:, None])
        inv = [numth.invert_uint_mod(q[-1], qi) for qi in q[:-1]]
        _mul_scalar_rows(self.lib, diff, inv, q[:-1])
        return diff

    def keygen_c0(self, a: np.ndarray, s: np.ndarray, e_ntt: np.ndarray
                  ) -> np.ndarray:
        """-(a*s + e) mod q over [L_sub, n]; all inputs < q."""
        L = self._rows(a.shape[0])
        out = np.empty_like(a)
        self.lib.sealtpu_keygen_c0(
            _p(a), _p(s), _p(e_ntt), _p(out), L, self.n, self._tp("q"),
            self._tp("r0"), self._tp("r1"))
        return out

    def dyadic_mul(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        """a*b mod q over [L_sub, n] (NTT-domain product)."""
        L = self._rows(a.shape[0])
        out = np.empty_like(a)
        self.lib.sealtpu_dyadic_mul(
            _p(a), _p(b), _p(out), L, self.n, self._tp("q"),
            self._tp("r0"), self._tp("r1"))
        return out

    def add_inplace(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        """In-place a = (a + b) mod q."""
        L = self._rows(a.shape[0])
        self.lib.sealtpu_add_inplace(_p(a), _p(b), L, self.n, self._tp("q"))
        return a

    def add_neg_inplace(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        """In-place a = -(a + b) mod q."""
        L = self._rows(a.shape[0])
        self.lib.sealtpu_add_neg_inplace(_p(a), _p(b), L, self.n, self._tp("q"))
        return a

    def mul_scalar(self, x: np.ndarray, scalars) -> np.ndarray:
        """In-place x[l] *= scalars[l] mod q (Shoup, full reduce)."""
        L = self._rows(x.shape[0])
        s_op = np.asarray(
            [int(v) for v in scalars[:L]], dtype=np.uint64)
        s_qt = np.asarray(
            [(int(v) << 64) // int(q) for v, q in zip(scalars[:L], self.q)],
            dtype=np.uint64)
        self.lib.sealtpu_mul_scalar_shoup(
            _p(x), L, self.n, _p(s_op), _p(s_qt), self._tp("q"))
        return x

    # -- batched (_many) twins: [B, L_sub, n] stacks, one crossing ---------

    def ntt_forward_many(self, x: np.ndarray, lazy: bool = False,
                         row0: int = 0) -> np.ndarray:
        """In-place forward NTT over [B, L_sub, n] (bit-identical to B
        sequential ntt_forward calls)."""
        B = x.shape[0]
        L = self._rows(row0 + x.shape[1]) - row0
        assert x.flags.c_contiguous and x.dtype == np.uint64
        self.lib.sealtpu_ntt_forward_many(
            _p(x), B, L, self.log_n, self._tp("fwd_op", row0),
            self._tp("fwd_qt", row0), self._tp("q", row0), int(lazy))
        return x

    def ntt_inverse_many(self, x: np.ndarray, lazy: bool = False,
                         row0: int = 0) -> np.ndarray:
        B = x.shape[0]
        L = self._rows(row0 + x.shape[1]) - row0
        assert x.flags.c_contiguous and x.dtype == np.uint64
        self.lib.sealtpu_ntt_inverse_many(
            _p(x), B, L, self.log_n, self._tp("inv_op", row0),
            self._tp("inv_qt", row0), self._tp("inv_n_op", row0),
            self._tp("inv_n_qt", row0), self._tp("last_op", row0),
            self._tp("last_qt", row0), self._tp("q", row0), int(lazy))
        return x

    def _rescale_consts(self, L: int):
        """(half_mod, inv_op, inv_qt) u64 arrays for dividing by q[L-1]."""
        from seal_tpu.utils import numth

        cache = getattr(self, "_rsc_cache", None)
        if cache is None:
            cache = self._rsc_cache = {}
        c = cache.get(L)
        if c is None:
            q = [int(v) for v in self.q[:L]]
            half = q[-1] >> 1
            inv = [numth.invert_uint_mod(q[-1], qi) for qi in q[:-1]]
            c = (np.asarray([half % qi for qi in q[:-1]], dtype=np.uint64),
                 np.asarray(inv, dtype=np.uint64),
                 np.asarray([(v << 64) // qi for v, qi in zip(inv, q[:-1])],
                            dtype=np.uint64))
            cache[L] = c
        return c

    def rescale_ntt_many(self, x: np.ndarray) -> np.ndarray:
        """Batched rescale_ntt: [B, L, N] NTT -> [B, L-1, N], value-
        identical to B sequential rescale_ntt calls (same kernels; the
        numpy glue broadcasts over the batch axis)."""
        B, L = x.shape[0], x.shape[1]
        if hasattr(self.lib, "sealtpu_rescale_ntt_many"):
            half_mod, inv_op, inv_qt = self._rescale_consts(L)
            scratch = np.empty((B, self.n), dtype=np.uint64)
            out = np.empty((B, L - 1, self.n), dtype=np.uint64)
            x = np.ascontiguousarray(x)
            tp = self._ptr0
            self.lib.sealtpu_rescale_ntt_many(
                _p(x), B, L, self.log_n, tp["inv_op"], tp["inv_qt"],
                tp["inv_n_op"], tp["inv_n_qt"], tp["last_op"],
                tp["last_qt"], tp["fwd_op"], tp["fwd_qt"], tp["q"],
                tp["r1"], _p(half_mod), _p(inv_op), _p(inv_qt),
                _p(scratch), _p(out))
            return out
        q = [int(v) for v in self.q[:L]]
        last = np.ascontiguousarray(x[:, L - 1:])
        self.ntt_inverse_many(last, row0=L - 1)
        half = q[-1] >> 1
        lastv = last[:, 0] + np.uint64(half)
        lastv = np.where(lastv >= np.uint64(q[-1]),
                         lastv - np.uint64(q[-1]), lastv)
        keep_q = np.asarray(q[:-1], dtype=np.uint64)
        temp = lastv[:, None, :] % keep_q[None, :, None]
        half_mod = np.asarray([half % qi for qi in q[:-1]], dtype=np.uint64)
        temp = np.ascontiguousarray(temp + (keep_q - half_mod)[None, :, None])
        self.ntt_forward_many(temp, lazy=True)           # < 4q
        diff = np.ascontiguousarray(
            x[:, :L - 1] + (keep_q << np.uint64(2))[None, :, None] - temp)
        _mul_scalar_rows(self.lib, diff.reshape(B * (L - 1), self.n),
                         None, None, pairs=self._inv_last_pairs(L, B))
        return diff

    def _inv_last_pairs(self, L: int, B: int):
        """Tiled Shoup pairs for q_last^{-1} mod q_i over B stacked polys
        (one big-int quotient per UNIQUE row via the shared
        _rescale_consts cache, then tiled)."""
        cache = getattr(self, "_ilp_cache", None)
        if cache is None:
            cache = self._ilp_cache = {}
        pairs = cache.get((L, B))
        if pairs is None:
            _, inv_op, inv_qt = self._rescale_consts(L)
            qa = np.ascontiguousarray(self.q[:L - 1])
            pairs = (np.tile(inv_op, B), np.tile(inv_qt, B),
                     np.tile(qa, B))
            cache[(L, B)] = pairs
        return pairs

    def rescale_coeff_many(self, x: np.ndarray) -> np.ndarray:
        """Batched rescale_coeff: [B, L, N] coeff -> [B, L-1, N]."""
        B, L = x.shape[0], x.shape[1]
        if hasattr(self.lib, "sealtpu_rescale_coeff_many"):
            half_mod, inv_op, inv_qt = self._rescale_consts(L)
            out = np.empty((B, L - 1, self.n), dtype=np.uint64)
            x = np.ascontiguousarray(x)
            self.lib.sealtpu_rescale_coeff_many(
                _p(x), B, L, self.n, self._ptr0["q"], self._ptr0["r1"],
                _p(half_mod), _p(inv_op), _p(inv_qt), _p(out))
            return out
        q = [int(v) for v in self.q[:L]]
        half = q[-1] >> 1
        lastv = x[:, L - 1] + np.uint64(half)
        lastv = np.where(lastv >= np.uint64(q[-1]),
                         lastv - np.uint64(q[-1]), lastv)
        keep_q = np.asarray(q[:-1], dtype=np.uint64)
        temp = lastv[:, None, :] % keep_q[None, :, None]
        half_mod = np.asarray([half % qi for qi in q[:-1]], dtype=np.uint64)
        temp = (temp + (keep_q - half_mod)[None, :, None]) \
            % keep_q[None, :, None]
        diff = np.ascontiguousarray(
            (x[:, :L - 1] + keep_q[None, :, None] - temp)
            % keep_q[None, :, None])
        _mul_scalar_rows(self.lib, diff.reshape(B * (L - 1), self.n),
                         None, None, pairs=self._inv_last_pairs(L, B))
        return diff

    def bgv_modtq_many(self, x: np.ndarray, t: int) -> np.ndarray | None:
        """Batched BGV modswitch: [B, L, N] coeff -> [B, L-1, N], exact
        division by q[L-1] after adding a multiple of t (value-identical to
        ops/rns.py mod_t_and_divide_q_last)."""
        if not hasattr(self.lib, "sealtpu_bgv_modtq_many"):
            return None
        from seal_tpu.utils import numth

        B, L = x.shape[0], x.shape[1]
        cache = getattr(self, "_bgvmq_cache", None)
        if cache is None:
            cache = self._bgvmq_cache = {}
        c = cache.get((L, t))
        if c is None:
            q = [int(v) for v in self.q[:L]]
            ql = q[-1]
            t_r1 = ((1 << 128) // t) >> 64
            iqt = numth.invert_uint_mod(ql % t, t)
            qlm = [ql % qi for qi in q[:-1]]
            iql = [numth.invert_uint_mod(ql, qi) for qi in q[:-1]]
            c = (int(t_r1), int(iqt), (iqt << 64) // t,
                 _shoup_pairs(qlm, q[:-1]), _shoup_pairs(iql, q[:-1]))
            cache[(L, t)] = c
        t_r1, iqt_op, iqt_qt, qlm_pairs, iql_pairs = c
        out = np.empty((B, L - 1, self.n), dtype=np.uint64)
        x = np.ascontiguousarray(x)
        self.lib.sealtpu_bgv_modtq_many(
            _p(x), B, L, self.n, self._ptr0["q"], self._ptr0["r1"],
            int(t), t_r1, iqt_op, iqt_qt, _p(qlm_pairs[0]),
            _p(qlm_pairs[1]), _p(iql_pairs[0]), _p(iql_pairs[1]), _p(out))
        return out

    def keygen_c0_many(self, a: np.ndarray, s: np.ndarray, e: np.ndarray
                       ) -> np.ndarray:
        """out[b] = -(a[b]*s + e[b]) over [B, L_sub, n]; s is the shared
        [L_sub, n] secret key."""
        B, L = a.shape[0], self._rows(a.shape[1])
        out = np.empty_like(a)
        tp = self._ptr0
        self.lib.sealtpu_keygen_c0_many(
            _p(a), _p(s), _p(e), _p(out), B, L, self.n, tp["q"], tp["r0"],
            tp["r1"])
        return out

    def dyadic_mul_shared_many(self, a: np.ndarray, s: np.ndarray
                               ) -> np.ndarray:
        """out[b] = a[b] * s over [B, L_sub, n]; s shared [L_sub, n]."""
        B, L = a.shape[0], self._rows(a.shape[1])
        out = np.empty_like(a)
        tp = self._ptr0
        self.lib.sealtpu_dyadic_mul_shared_many(
            _p(a), _p(s), _p(out), B, L, self.n, tp["q"], tp["r0"],
            tp["r1"])
        return out

    def add_inplace_many(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        B, L = a.shape[0], self._rows(a.shape[1])
        self.lib.sealtpu_add_inplace_many(
            _p(a), _p(b), B, L, self.n, self._ptr0["q"])
        return a

    def add_neg_inplace_many(self, a: np.ndarray, b: np.ndarray
                             ) -> np.ndarray:
        B, L = a.shape[0], self._rows(a.shape[1])
        self.lib.sealtpu_add_neg_inplace_many(
            _p(a), _p(b), B, L, self.n, self._ptr0["q"])
        return a

    def phase2_many(self, cts: np.ndarray, sk_ntt: np.ndarray,
                    ntt_form: bool) -> np.ndarray:
        """B fused size-2 decrypt phases: cts [B, 2, L, n] -> [B, L, n]."""
        B, L = cts.shape[0], cts.shape[2]
        out = np.empty((B, L, self.n), dtype=np.uint64)
        tp = self._ptr0
        self.lib.sealtpu_phase2_many(
            _p(cts), _p(sk_ntt), B, L, self.n, self.log_n,
            tp["fwd_op"], tp["fwd_qt"], tp["inv_op"], tp["inv_qt"],
            tp["inv_n_op"], tp["inv_n_qt"], tp["last_op"], tp["last_qt"],
            tp["q"], tp["r0"], tp["r1"], int(ntt_form), _p(out))
        return out

    def reduce_signed_rows_many(self, v: np.ndarray, L: int) -> np.ndarray:
        """[B, n] int64 signed coefficients -> [B, L, n] RNS residues."""
        B = v.shape[0]
        out = np.empty((B, L, self.n), dtype=np.uint64)
        self.lib.sealtpu_reduce_signed_rows_many(
            _pi64(v), B, self.n, L, self._ptr0["q"], self._ptr0["r1"],
            _p(out))
        return out

    def absorb(self, c0: np.ndarray, key: np.ndarray, factors) -> np.ndarray:
        """In-place c0[l] += key[l] * factors[l] mod q (0-factor rows are
        no-ops) — the kswitch-key digit absorb."""
        L = self._rows(c0.shape[0])
        f_op = np.asarray([int(v) for v in factors[:L]], dtype=np.uint64)
        f_qt = np.asarray(
            [(int(v) << 64) // int(q) for v, q in zip(factors[:L], self.q)],
            dtype=np.uint64)
        self.lib.sealtpu_absorb(
            _p(c0), _p(key), L, self.n, _p(f_op), _p(f_qt), self._tp("q"))
        return c0


def _shoup_pairs(scalars, moduli):
    """Precomputed (s_op, s_qt, q) u64 arrays for _mul_scalar_rows — the
    Python big-int `<< 64 // q` quotients cost ~10 us per row, so hot
    callers (the decrypt tail) build these once."""
    s_op = np.asarray([int(v) for v in scalars], dtype=np.uint64)
    s_qt = np.asarray([(int(v) << 64) // int(q)
                       for v, q in zip(scalars, moduli)], dtype=np.uint64)
    q = np.asarray([int(m) for m in moduli], dtype=np.uint64)
    return s_op, s_qt, q


def _mul_scalar_rows(lib, x: np.ndarray, scalars, moduli,
                     pairs=None) -> np.ndarray:
    """In-place x[l] *= scalars[l] mod moduli[l] over [L, n] (arbitrary
    moduli — not tied to a NativePolyOps tower)."""
    L, n = x.shape
    if pairs is None:
        pairs = _shoup_pairs(scalars[:L], moduli[:L])
    s_op, s_qt, q = pairs
    lib.sealtpu_mul_scalar_shoup(_p(x), L, n, _p(s_op), _p(s_qt), _p(q))
    return x


class NativeDecryptTool:
    """Native host decrypt tails (ops/rns.py decrypt_scale_and_round /
    decrypt_modt parity; rns.cpp:1133-1246): scaled residues + base
    conversion + correction, all u64 C passes."""

    def __init__(self, rns_tool_host, npoly_q: NativePolyOps):
        host = rns_tool_host
        self.available = (npoly_q is not None and npoly_q.available
                          and bool(host.t))
        if not self.available:
            return
        self.lib = npoly_q.lib
        self.n = host.n
        q_base = host.base_q
        self.q = np.asarray(q_base.base, dtype=np.uint64)
        self.Li = q_base.size
        self.t = host.t
        self.gamma = host.gamma
        self.inv_gamma_mod_t = host.inv_gamma_mod_t
        self.invp = [int(v) for v in q_base.inv_punctured_prod]
        self.prod_t_gamma = [int(v) for v in host.prod_t_gamma_mod_q]
        self.neg_inv_tg = [int(v) for v in host.neg_inv_q_mod_t_gamma]
        tg = host.base_t_gamma
        self.tg_base = np.asarray(tg.base, dtype=np.uint64)
        self.tg_r0 = np.asarray(
            [((1 << 128) // p) & 0xFFFFFFFFFFFFFFFF for p in tg.base],
            dtype=np.uint64)
        self.tg_r1 = np.asarray(
            [((1 << 128) // p) >> 64 for p in tg.base], dtype=np.uint64)
        self.M_tg = np.asarray(
            [[pp % p for pp in q_base.punctured_prod] for p in tg.base],
            dtype=np.uint64)
        # BGV: exact conversion to the single base {t}
        self.M_t = np.asarray([[pp % host.t for pp in q_base.punctured_prod]],
                              dtype=np.uint64)
        self.t_r0 = np.asarray(
            [((1 << 128) // host.t) & 0xFFFFFFFFFFFFFFFF], dtype=np.uint64)
        self.t_r1 = np.asarray([((1 << 128) // host.t) >> 64],
                               dtype=np.uint64)
        self.q_mod_t = q_base.base_prod % host.t
        self.ratio_lo = np.asarray(
            [((1 << 128) // q) & 0xFFFFFFFFFFFFFFFF for q in q_base.base],
            dtype=np.uint64)
        self.ratio_hi = np.asarray(
            [((1 << 128) // q) >> 64 for q in q_base.base], dtype=np.uint64)
        # precomputed Shoup pairs for every per-call scalar multiply (r4:
        # these were rebuilt with Python big-int divisions on EVERY decrypt
        # — a fixed ~100 us that dominated small-n rows)
        qlist = [int(v) for v in self.q]
        self._invp_pairs = _shoup_pairs(self.invp, qlist)
        self._ptg_pairs = _shoup_pairs(self.prod_t_gamma, qlist)
        self._negtg_pairs = _shoup_pairs(
            self.neg_inv_tg, [int(v) for v in self.tg_base])
        self._invg_op = int(self.inv_gamma_mod_t)
        self._invg_qt = (self._invg_op << 64) // int(self.t)
        # combined constant for the one-call tail: the two leading Shoup
        # scalar multiplies compose exactly (both are exact modular
        # multiplies), so prod_t_gamma then qhat^{-1} = one multiply by
        # their product mod q
        comb = [(int(a) * int(b)) % q
                for a, b, q in zip(self.prod_t_gamma, self.invp, qlist)]
        self._comb_pairs = _shoup_pairs(comb, qlist)
        self._scratch = np.empty((self.Li, self.n), dtype=np.uint64)

    def _scaled(self, phase: np.ndarray) -> np.ndarray:
        xhat = np.ascontiguousarray(phase[:self.Li]).copy()
        _mul_scalar_rows(self.lib, xhat, self.invp, self.q,
                         pairs=self._invp_pairs)
        return xhat

    def bfv_decrypt2(self, npoly: "NativePolyOps", c0: np.ndarray,
                     c1: np.ndarray, sk_ntt: np.ndarray) -> np.ndarray:
        """Whole size-2 BFV decrypt (phase + {t,γ} tail) via a C-side PLAN
        handle: constants are snapshotted once, per-call marshaling is 5
        arguments (the 33-argument variant spent ~8 us/call in ctypes)."""
        plan = getattr(self, "_plan", None)
        if plan is None:
            tp = npoly._ptr0
            s_op, s_qt, _ = self._comb_pairs
            n_op, n_qt, _ = self._negtg_pairs
            self._phase_scratch = np.empty((self.Li, self.n), dtype=np.uint64)
            # the plan stores raw pointers: keep every referenced array alive
            self._plan_refs = (s_op, s_qt, n_op, n_qt, npoly)
            plan = self.lib.sealtpu_bfv_plan_create(
                self.Li, self.n, npoly.log_n,
                tp["fwd_op"], tp["fwd_qt"], tp["inv_op"], tp["inv_qt"],
                tp["inv_n_op"], tp["inv_n_qt"], tp["last_op"], tp["last_qt"],
                tp["q"], tp["r0"], tp["r1"],
                _p(s_op), _p(s_qt), _p(self.M_tg), _p(self.tg_base),
                _p(self.tg_r0), _p(self.tg_r1), _p(n_op), _p(n_qt),
                int(self.t), int(self.gamma), self._invg_op, self._invg_qt,
                _p(self._phase_scratch), _p(self._scratch))
            self._plan = plan
        dest = np.empty(self.n, dtype=np.uint64)
        self.lib.sealtpu_bfv_decrypt_plan(
            plan, _p(c0), _p(c1), _p(sk_ntt), _p(dest))
        return dest

    def bfv_decrypt_many(self, npoly: "NativePolyOps", cts: np.ndarray,
                         sk_ntt: np.ndarray) -> np.ndarray:
        """B whole size-2 BFV decrypts through the plan handle: cts is the
        stacked [B, 2, L, n] u64 data, returns [B, n] plaintext
        coefficients (bit-identical to B bfv_decrypt2 calls)."""
        if getattr(self, "_plan", None) is None:
            # build the plan via the single-ct entry (shares all constants)
            self.bfv_decrypt2(npoly, np.ascontiguousarray(cts[0, 0]),
                              np.ascontiguousarray(cts[0, 1]), sk_ntt)
        B = cts.shape[0]
        dest = np.empty((B, self.n), dtype=np.uint64)
        self.lib.sealtpu_bfv_decrypt_plan_many(
            self._plan, _p(cts), B, _p(sk_ntt), _p(dest))
        return dest

    def __del__(self):
        plan = getattr(self, "_plan", None)
        if plan is not None and getattr(self, "lib", None) is not None:
            try:
                self.lib.sealtpu_plan_free(plan)
            except Exception:  # noqa: BLE001 — interpreter teardown
                pass

    def bfv_scale_round(self, phase: np.ndarray) -> np.ndarray:
        """[Lq, N] phase -> [N] mod t: the whole {t, γ} route in ONE native
        call (rns.cpp:1133-1201; five calls' ctypes dispatch previously
        exceeded the arithmetic at small n)."""
        phase = np.ascontiguousarray(phase[:self.Li])
        dest = np.empty(self.n, dtype=np.uint64)
        s_op, s_qt, q = self._comb_pairs
        n_op, n_qt, _ = self._negtg_pairs
        self.lib.sealtpu_bfv_decrypt_tail(
            _p(phase), self.Li, self.n, _p(s_op), _p(s_qt), _p(q),
            _p(self.M_tg), _p(self.tg_base), _p(self.tg_r0), _p(self.tg_r1),
            _p(n_op), _p(n_qt), int(self.t), int(self.gamma),
            self._invg_op, self._invg_qt, _p(self._scratch), _p(dest))
        return dest

    def bgv_modt_many(self, phases: np.ndarray) -> np.ndarray | None:
        """B BGV decrypt tails in ONE crossing: phases [B, Li, n] (consumed
        as scratch) -> [B, n] mod-t values, bit-identical to per-ct
        bgv_modt calls."""
        if not hasattr(self.lib, "sealtpu_bgv_modt_many"):
            return None
        B = phases.shape[0]
        phases = np.ascontiguousarray(phases[:, :self.Li])
        s_op, s_qt, q = self._invp_pairs
        out = np.empty((B, self.n), dtype=np.uint64)
        self.lib.sealtpu_bgv_modt_many(
            _p(phases), B, self.Li, self.n, _p(s_op), _p(s_qt), _p(q),
            _p(self.M_t), int(self.t), _p(self.t_r0), _p(self.t_r1),
            _p(self.ratio_lo), _p(self.ratio_hi), int(self.q_mod_t),
            _p(out))
        return out

    def bgv_modt(self, phase: np.ndarray) -> np.ndarray:
        """[Lq, N] phase -> [N] mod t (exact conversion + v-correction)."""
        xhat = self._scaled(phase)
        dot = np.empty((1, self.n), dtype=np.uint64)
        self.lib.sealtpu_base_convert_dot(
            _p(xhat), self.Li, self.n, _p(self.M_t), 1,
            np.asarray([self.t], dtype=np.uint64).ctypes.data_as(_U64P),
            _p(self.t_r0), _p(self.t_r1), _p(dot))
        self.lib.sealtpu_exact_convert_fix(
            _p(xhat), self.Li, self.n, _p(self.ratio_lo), _p(self.ratio_hi),
            _p(dot), int(self.q_mod_t), int(self.t), 0, 0)
        return dot[0]


def decrypt_tool_for(cd) -> NativeDecryptTool | None:
    """Cached NativeDecryptTool for one chain level (None when native is
    unavailable or the scheme has no plain modulus)."""
    tool = getattr(cd, "_native_dec", None)
    if tool is None:
        npoly = for_context_data(cd)
        if npoly is None or cd.rns_tool_host is None:
            return None
        tool = NativeDecryptTool(cd.rns_tool_host, npoly)
        cd._native_dec = tool
    return tool if tool.available else None


def for_context_data(cd) -> NativePolyOps | None:
    """The cached NativePolyOps for one chain level, or None if the native
    library is unavailable or disabled (config.use_native_keygen)."""
    from seal_tpu.config import config

    if not config.use_native_keygen:
        return None
    ops = getattr(cd, "_native_poly", None)
    if ops is None:
        ops = NativePolyOps(cd.ntt_tables)
        cd._native_poly = ops
    return ops if ops.available else None
