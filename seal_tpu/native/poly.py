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


def _p(arr: np.ndarray):
    return arr.ctypes.data_as(_U64P)


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
            _p(x), L, self.log_n, _p(self.fwd_op[row0:]),
            _p(self.fwd_qt[row0:]), _p(self.q[row0:]), int(lazy))
        return x

    def ntt_inverse(self, x: np.ndarray, lazy: bool = False,
                    row0: int = 0) -> np.ndarray:
        L = self._rows(row0 + x.shape[0]) - row0
        assert x.flags.c_contiguous and x.dtype == np.uint64
        self.lib.sealtpu_ntt_inverse(
            _p(x), L, self.log_n, _p(self.inv_op[row0:]),
            _p(self.inv_qt[row0:]), _p(self.inv_n_op[row0:]),
            _p(self.inv_n_qt[row0:]), _p(self.last_op[row0:]),
            _p(self.last_qt[row0:]), _p(self.q[row0:]), int(lazy))
        return x

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
            _p(a), _p(s), _p(e_ntt), _p(out), L, self.n, _p(self.q),
            _p(self.r0), _p(self.r1))
        return out

    def dyadic_mul(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        """a*b mod q over [L_sub, n] (NTT-domain product)."""
        L = self._rows(a.shape[0])
        out = np.empty_like(a)
        self.lib.sealtpu_dyadic_mul(
            _p(a), _p(b), _p(out), L, self.n, _p(self.q),
            _p(self.r0), _p(self.r1))
        return out

    def add_inplace(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        """In-place a = (a + b) mod q."""
        L = self._rows(a.shape[0])
        self.lib.sealtpu_add_inplace(_p(a), _p(b), L, self.n, _p(self.q))
        return a

    def add_neg_inplace(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        """In-place a = -(a + b) mod q."""
        L = self._rows(a.shape[0])
        self.lib.sealtpu_add_neg_inplace(_p(a), _p(b), L, self.n, _p(self.q))
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
            _p(x), L, self.n, _p(s_op), _p(s_qt), _p(self.q))
        return x

    def absorb(self, c0: np.ndarray, key: np.ndarray, factors) -> np.ndarray:
        """In-place c0[l] += key[l] * factors[l] mod q (0-factor rows are
        no-ops) — the kswitch-key digit absorb."""
        L = self._rows(c0.shape[0])
        f_op = np.asarray([int(v) for v in factors[:L]], dtype=np.uint64)
        f_qt = np.asarray(
            [(int(v) << 64) // int(q) for v, q in zip(factors[:L], self.q)],
            dtype=np.uint64)
        self.lib.sealtpu_absorb(
            _p(c0), _p(key), L, self.n, _p(f_op), _p(f_qt), _p(self.q))
        return c0


def _mul_scalar_rows(lib, x: np.ndarray, scalars, moduli) -> np.ndarray:
    """In-place x[l] *= scalars[l] mod moduli[l] over [L, n] (arbitrary
    moduli — not tied to a NativePolyOps tower)."""
    L, n = x.shape
    s_op = np.asarray([int(v) for v in scalars[:L]], dtype=np.uint64)
    s_qt = np.asarray([(int(v) << 64) // int(q)
                       for v, q in zip(scalars[:L], moduli[:L])],
                      dtype=np.uint64)
    q = np.asarray([int(m) for m in moduli[:L]], dtype=np.uint64)
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

    def _scaled(self, phase: np.ndarray) -> np.ndarray:
        xhat = np.ascontiguousarray(phase[:self.Li]).copy()
        _mul_scalar_rows(self.lib, xhat, self.invp, self.q)
        return xhat

    def bfv_scale_round(self, phase: np.ndarray) -> np.ndarray:
        """[Lq, N] phase -> [N] mod t (the {t, γ} route)."""
        x = np.ascontiguousarray(phase[:self.Li]).copy()
        _mul_scalar_rows(self.lib, x, self.prod_t_gamma, self.q)
        xhat = self._scaled(x)
        tgv = np.empty((2, self.n), dtype=np.uint64)
        self.lib.sealtpu_base_convert_dot(
            _p(xhat), self.Li, self.n, _p(self.M_tg), 2, _p(self.tg_base),
            _p(self.tg_r0), _p(self.tg_r1), _p(tgv))
        _mul_scalar_rows(self.lib, tgv, self.neg_inv_tg, self.tg_base)
        t = self.t
        gamma = self.gamma
        t_row, g_row = tgv[0], tgv[1]
        over = g_row > np.uint64(gamma >> 1)
        corr_pos = (t_row + (np.uint64(gamma) - g_row) % np.uint64(t)) \
            % np.uint64(t)
        corr_neg = (t_row + np.uint64(t) - g_row % np.uint64(t)) \
            % np.uint64(t)
        dest = np.ascontiguousarray(
            np.where(over, corr_pos, corr_neg).reshape(1, self.n))
        _mul_scalar_rows(self.lib, dest, [self.inv_gamma_mod_t], [t])
        return dest[0]

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
