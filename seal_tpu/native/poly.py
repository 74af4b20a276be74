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

    def ntt_forward(self, x: np.ndarray, lazy: bool = False) -> np.ndarray:
        """In-place forward negacyclic NTT over [L_sub, n] u64."""
        L = self._rows(x.shape[0])
        assert x.flags.c_contiguous and x.dtype == np.uint64
        self.lib.sealtpu_ntt_forward(
            _p(x), L, self.log_n, _p(self.fwd_op), _p(self.fwd_qt),
            _p(self.q), int(lazy))
        return x

    def ntt_inverse(self, x: np.ndarray, lazy: bool = False) -> np.ndarray:
        L = self._rows(x.shape[0])
        assert x.flags.c_contiguous and x.dtype == np.uint64
        self.lib.sealtpu_ntt_inverse(
            _p(x), L, self.log_n, _p(self.inv_op), _p(self.inv_qt),
            _p(self.inv_n_op), _p(self.inv_n_qt), _p(self.last_op),
            _p(self.last_qt), _p(self.q), int(lazy))
        return x

    def keygen_c0(self, a: np.ndarray, s: np.ndarray, e_ntt: np.ndarray
                  ) -> np.ndarray:
        """-(a*s + e) mod q over [L_sub, n]; all inputs < q."""
        L = self._rows(a.shape[0])
        out = np.empty_like(a)
        self.lib.sealtpu_keygen_c0(
            _p(a), _p(s), _p(e_ntt), _p(out), L, self.n, _p(self.q),
            _p(self.r0), _p(self.r1))
        return out

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
