"""Native (C++) runtime components, built on demand and bound via ctypes.

The compute path is jax/XLA/Pallas; the host-side runtime hot spots — the
blake2xb PRNG stream feeding the samplers — run natively here (the pure
Python implementations in seal_tpu.utils.blake2 / seal_tpu.randomgen remain
as fallback and cross-check).
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import threading

_here = pathlib.Path(__file__).parent
_srcs = [_here / "blake2_native.cpp", _here / "rns_native.cpp",
         _here / "poly_native.cpp"]
_so = _here / "libsealtpu_native.so"
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    # full 512-bit vectors first (gcc's -march=native tuning otherwise
    # splits the 8-lane u64 blake2 compression into 2x ymm — measured 3x
    # slower); the flag is x86-only, so fall back without it
    # -ffp-contract=off: the DWT butterflies (poly_native.cpp) must round
    # exactly like the reference's baseline-x86 build — FMA contraction
    # would change the complex-multiply rounding and break bit-exactness.
    # (All other native code is integer; the flag costs nothing there.)
    for extra in (["-mprefer-vector-width=512"], []):
        try:
            subprocess.run(
                ["g++", "-O3", "-march=native", "-ffp-contract=off", *extra,
                 "-shared", "-fPIC",
                 *map(str, _srcs), "-o", str(_so)],
                check=True, capture_output=True, timeout=120,
            )
            return True
        except (subprocess.SubprocessError, FileNotFoundError):
            continue
    return False


def get_lib():
    """The loaded native library, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _so.exists() or any(
            _so.stat().st_mtime < s.stat().st_mtime for s in _srcs
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(str(_so))
        except OSError:
            return None
        lib.sealtpu_blake2xb_stream.argtypes = [
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
        ]
        lib.sealtpu_blake2xb_stream.restype = None
        c_u64p = ctypes.POINTER(ctypes.c_uint64)
        lib.sealtpu_crt_compose_center_f64.argtypes = [
            c_u64p, ctypes.c_size_t, ctypes.c_size_t, c_u64p, c_u64p,
            c_u64p, c_u64p, c_u64p, ctypes.c_size_t, ctypes.c_double,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.sealtpu_crt_compose_center_f64.restype = None
        lib.sealtpu_crt_decode_center_ref.argtypes = [
            c_u64p, ctypes.c_size_t, ctypes.c_size_t, c_u64p, c_u64p,
            c_u64p, c_u64p, c_u64p, ctypes.c_size_t, ctypes.c_double,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.sealtpu_crt_decode_center_ref.restype = None
        lib.sealtpu_crt_compose_words.argtypes = [
            c_u64p, ctypes.c_size_t, ctypes.c_size_t, c_u64p, c_u64p,
            c_u64p, c_u64p, ctypes.c_size_t, c_u64p,
        ]
        lib.sealtpu_crt_compose_words.restype = None
        lib.sealtpu_ntt_forward.argtypes = [
            c_u64p, ctypes.c_size_t, ctypes.c_size_t, c_u64p, c_u64p,
            c_u64p, ctypes.c_int,
        ]
        lib.sealtpu_ntt_forward.restype = None
        lib.sealtpu_ntt_inverse.argtypes = [
            c_u64p, ctypes.c_size_t, ctypes.c_size_t, c_u64p, c_u64p,
            c_u64p, c_u64p, c_u64p, c_u64p, c_u64p, ctypes.c_int,
        ]
        lib.sealtpu_ntt_inverse.restype = None
        lib.sealtpu_keygen_c0.argtypes = [
            c_u64p, c_u64p, c_u64p, c_u64p, ctypes.c_size_t,
            ctypes.c_size_t, c_u64p, c_u64p, c_u64p,
        ]
        lib.sealtpu_keygen_c0.restype = None
        lib.sealtpu_mul_scalar_shoup.argtypes = [
            c_u64p, ctypes.c_size_t, ctypes.c_size_t, c_u64p, c_u64p, c_u64p,
        ]
        lib.sealtpu_mul_scalar_shoup.restype = None
        c_f64p = ctypes.POINTER(ctypes.c_double)
        lib.sealtpu_dwt_from_rev.argtypes = [
            c_f64p, c_f64p, ctypes.c_size_t, c_f64p, c_f64p,
            ctypes.c_int, ctypes.c_double,
        ]
        lib.sealtpu_dwt_from_rev.restype = None
        lib.sealtpu_dwt_to_rev.argtypes = [
            c_f64p, c_f64p, ctypes.c_size_t, c_f64p, c_f64p,
            ctypes.c_int, ctypes.c_double,
        ]
        lib.sealtpu_dwt_to_rev.restype = None
        lib.sealtpu_bfv_decrypt_tail.argtypes = [
            c_u64p, ctypes.c_size_t, ctypes.c_size_t, c_u64p, c_u64p,
            c_u64p, c_u64p, c_u64p, c_u64p, c_u64p, c_u64p, c_u64p,
            ctypes.c_uint64, ctypes.c_uint64, ctypes.c_uint64,
            ctypes.c_uint64, c_u64p, c_u64p,
        ]
        lib.sealtpu_bfv_decrypt_tail.restype = None
        lib.sealtpu_bfv_plan_create.argtypes = (
            [ctypes.c_size_t] * 3 + [c_u64p] * 19
            + [ctypes.c_uint64] * 4 + [c_u64p] * 2
        )
        lib.sealtpu_bfv_plan_create.restype = ctypes.c_void_p
        lib.sealtpu_plan_free.argtypes = [ctypes.c_void_p]
        lib.sealtpu_plan_free.restype = None
        lib.sealtpu_bfv_decrypt_plan.argtypes = [
            ctypes.c_void_p, c_u64p, c_u64p, c_u64p, c_u64p,
        ]
        lib.sealtpu_bfv_decrypt_plan.restype = None
        c_i64p = ctypes.POINTER(ctypes.c_int64)
        lib.sealtpu_reduce_signed_rows.argtypes = [
            c_i64p, ctypes.c_size_t, ctypes.c_size_t, c_u64p, c_u64p,
            c_u64p,
        ]
        lib.sealtpu_reduce_signed_rows.restype = None
        lib.sealtpu_batch_encode.argtypes = [
            c_u64p, ctypes.c_size_t, ctypes.c_size_t, c_i64p,
            ctypes.c_size_t, c_u64p, c_u64p, c_u64p, c_u64p, c_u64p,
            c_u64p, c_u64p, c_u64p,
        ]
        lib.sealtpu_batch_encode.restype = None
        lib.sealtpu_batch_decode.argtypes = [
            c_u64p, ctypes.c_size_t, ctypes.c_size_t, c_i64p,
            ctypes.c_size_t, c_u64p, c_u64p, c_u64p, c_u64p, c_u64p,
        ]
        lib.sealtpu_batch_decode.restype = None
        lib.sealtpu_bfv_decrypt2.argtypes = (
            [c_u64p] * 3 + [ctypes.c_size_t] * 3 + [c_u64p] * 19
            + [ctypes.c_uint64] * 4 + [c_u64p] * 3
        )
        lib.sealtpu_bfv_decrypt2.restype = None
        lib.sealtpu_phase2.argtypes = [
            c_u64p, c_u64p, c_u64p, ctypes.c_size_t, ctypes.c_size_t,
            ctypes.c_size_t, c_u64p, c_u64p, c_u64p, c_u64p, c_u64p,
            c_u64p, c_u64p, c_u64p, c_u64p, c_u64p, c_u64p,
            ctypes.c_int, c_u64p,
        ]
        lib.sealtpu_phase2.restype = None
        lib.sealtpu_bfv_tg_correct.argtypes = [
            c_u64p, c_u64p, ctypes.c_size_t, ctypes.c_uint64,
            ctypes.c_uint64, ctypes.c_uint64, ctypes.c_uint64, c_u64p,
        ]
        lib.sealtpu_bfv_tg_correct.restype = None
        lib.sealtpu_absorb.argtypes = [
            c_u64p, c_u64p, ctypes.c_size_t, ctypes.c_size_t, c_u64p,
            c_u64p, c_u64p,
        ]
        lib.sealtpu_absorb.restype = None
        lib.sealtpu_dyadic_mul.argtypes = [
            c_u64p, c_u64p, c_u64p, ctypes.c_size_t, ctypes.c_size_t,
            c_u64p, c_u64p, c_u64p,
        ]
        lib.sealtpu_dyadic_mul.restype = None
        lib.sealtpu_add_inplace.argtypes = [
            c_u64p, c_u64p, ctypes.c_size_t, ctypes.c_size_t, c_u64p,
        ]
        lib.sealtpu_add_inplace.restype = None
        lib.sealtpu_add_neg_inplace.argtypes = [
            c_u64p, c_u64p, ctypes.c_size_t, ctypes.c_size_t, c_u64p,
        ]
        lib.sealtpu_add_neg_inplace.restype = None
        lib.sealtpu_scaled_plain.argtypes = [
            c_u64p, ctypes.c_size_t, ctypes.c_size_t, ctypes.c_size_t,
            c_u64p, c_u64p, ctypes.c_uint64, ctypes.c_uint64,
            ctypes.c_uint64, c_u64p,
        ]
        lib.sealtpu_scaled_plain.restype = None
        lib.sealtpu_base_convert_dot.argtypes = [
            c_u64p, ctypes.c_size_t, ctypes.c_size_t, c_u64p,
            ctypes.c_size_t, c_u64p, c_u64p, c_u64p, c_u64p,
        ]
        lib.sealtpu_base_convert_dot.restype = None
        lib.sealtpu_exact_convert_fix.argtypes = [
            c_u64p, ctypes.c_size_t, ctypes.c_size_t, c_u64p, c_u64p,
            c_u64p, ctypes.c_uint64, ctypes.c_uint64, ctypes.c_uint64,
            ctypes.c_uint64,
        ]
        lib.sealtpu_exact_convert_fix.restype = None
        c_u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.sealtpu_cbd.argtypes = [
            c_u8p, ctypes.c_size_t, c_u64p, ctypes.c_size_t, c_u64p,
        ]
        lib.sealtpu_cbd.restype = None
        c_u32p = ctypes.POINTER(ctypes.c_uint32)
        lib.sealtpu_split_u32.argtypes = [
            c_u64p, ctypes.c_size_t, c_u32p, c_u32p,
        ]
        lib.sealtpu_split_u32.restype = None
        lib.sealtpu_merge_u64.argtypes = [
            c_u32p, c_u32p, ctypes.c_size_t, c_u64p,
        ]
        lib.sealtpu_merge_u64.restype = None
        lib.sealtpu_build_ntt_tables.argtypes = [
            ctypes.c_size_t, ctypes.c_uint64, ctypes.c_uint64,
            ctypes.c_uint64, c_u64p, c_u64p, c_u64p, c_u64p,
        ]
        lib.sealtpu_build_ntt_tables.restype = None
        # batched (_many) entry points — one crossing per batch (guarded:
        # a stale prebuilt .so without them must not break the load)
        c_i64p = ctypes.POINTER(ctypes.c_int64)
        try:
            c_f64p = ctypes.POINTER(ctypes.c_double)
            sz = ctypes.c_size_t
            lib.sealtpu_ntt_forward_many.argtypes = [
                c_u64p, sz, sz, sz, c_u64p, c_u64p, c_u64p, ctypes.c_int]
            lib.sealtpu_ntt_forward_many.restype = None
            lib.sealtpu_ntt_inverse_many.argtypes = [
                c_u64p, sz, sz, sz, c_u64p, c_u64p, c_u64p, c_u64p, c_u64p,
                c_u64p, c_u64p, ctypes.c_int]
            lib.sealtpu_ntt_inverse_many.restype = None
            lib.sealtpu_keygen_c0_many.argtypes = [
                c_u64p, c_u64p, c_u64p, c_u64p, sz, sz, sz, c_u64p, c_u64p,
                c_u64p]
            lib.sealtpu_keygen_c0_many.restype = None
            lib.sealtpu_dyadic_mul_shared_many.argtypes = [
                c_u64p, c_u64p, c_u64p, sz, sz, sz, c_u64p, c_u64p, c_u64p]
            lib.sealtpu_dyadic_mul_shared_many.restype = None
            lib.sealtpu_add_inplace_many.argtypes = [
                c_u64p, c_u64p, sz, sz, sz, c_u64p]
            lib.sealtpu_add_inplace_many.restype = None
            lib.sealtpu_add_neg_inplace_many.argtypes = [
                c_u64p, c_u64p, sz, sz, sz, c_u64p]
            lib.sealtpu_add_neg_inplace_many.restype = None
            lib.sealtpu_scaled_plain_add_many.argtypes = [
                c_u64p, sz, sz, sz, c_u64p, c_u64p, ctypes.c_uint64,
                ctypes.c_uint64, ctypes.c_uint64, c_u64p, sz]
            lib.sealtpu_scaled_plain_add_many.restype = None
            lib.sealtpu_batch_encode_many.argtypes = [
                c_u64p, sz, sz, sz, c_i64p, sz, c_u64p, c_u64p, c_u64p, c_u64p,
                c_u64p, c_u64p, c_u64p, c_u64p]
            lib.sealtpu_batch_encode_many.restype = None
            lib.sealtpu_batch_decode_many.argtypes = [
                c_u64p, sz, sz, c_i64p, sz, c_u64p, c_u64p, c_u64p, c_u64p,
                c_u64p]
            lib.sealtpu_batch_decode_many.restype = None
            lib.sealtpu_bfv_decrypt_plan_many.argtypes = [
                ctypes.c_void_p, c_u64p, sz, c_u64p, c_u64p]
            lib.sealtpu_bfv_decrypt_plan_many.restype = None
            lib.sealtpu_phase2_many.argtypes = [
                c_u64p, c_u64p, sz, sz, sz, sz, c_u64p, c_u64p, c_u64p, c_u64p,
                c_u64p, c_u64p, c_u64p, c_u64p, c_u64p, c_u64p, c_u64p,
                ctypes.c_int, c_u64p]
            lib.sealtpu_phase2_many.restype = None
            lib.sealtpu_dwt_from_rev_many.argtypes = [
                c_f64p, c_f64p, sz, sz, c_f64p, c_f64p, ctypes.c_int,
                ctypes.c_double]
            lib.sealtpu_dwt_from_rev_many.restype = None
            lib.sealtpu_dwt_to_rev_many.argtypes = [
                c_f64p, c_f64p, sz, sz, c_f64p, c_f64p, ctypes.c_int,
                ctypes.c_double]
            lib.sealtpu_dwt_to_rev_many.restype = None
            lib.sealtpu_reduce_signed_rows_many.argtypes = [
                c_i64p, sz, sz, sz, c_u64p, c_u64p, c_u64p]
            lib.sealtpu_reduce_signed_rows_many.restype = None
            lib.sealtpu_crt_decode_center_ref_many.argtypes = [
                c_u64p, sz, sz, sz, c_u64p, c_u64p, c_u64p, c_u64p, c_u64p, sz,
                ctypes.c_double, c_f64p]
            lib.sealtpu_crt_decode_center_ref_many.restype = None
            lib.sealtpu_ckks_scatter_many.argtypes = [
            c_f64p, c_f64p, sz, sz, sz, sz, c_i64p, c_f64p, c_f64p]
            lib.sealtpu_ckks_scatter_many.restype = None
            lib.sealtpu_ckks_round_reduce_many.argtypes = [
            c_f64p, sz, sz, sz, c_u64p, c_u64p, c_u64p, c_f64p]
            lib.sealtpu_ckks_round_reduce_many.restype = None
            lib.sealtpu_bgv_modt_many.argtypes = [
                c_u64p, sz, sz, sz, c_u64p, c_u64p, c_u64p, c_u64p,
                ctypes.c_uint64, c_u64p, c_u64p, c_u64p, c_u64p,
                ctypes.c_uint64, c_u64p]
            lib.sealtpu_bgv_modt_many.restype = None
            lib.sealtpu_rescale_coeff_many.argtypes = [
                c_u64p, sz, sz, sz, c_u64p, c_u64p, c_u64p, c_u64p,
                c_u64p, c_u64p]
            lib.sealtpu_rescale_coeff_many.restype = None
            lib.sealtpu_rescale_ntt_many.argtypes = [
                c_u64p, sz, sz, sz, c_u64p, c_u64p, c_u64p, c_u64p,
                c_u64p, c_u64p, c_u64p, c_u64p, c_u64p, c_u64p, c_u64p,
                c_u64p, c_u64p, c_u64p, c_u64p]
            lib.sealtpu_rescale_ntt_many.restype = None
            lib.sealtpu_bgv_modtq_many.argtypes = [
                c_u64p, sz, sz, sz, c_u64p, c_u64p, ctypes.c_uint64,
                ctypes.c_uint64, ctypes.c_uint64, ctypes.c_uint64,
                c_u64p, c_u64p, c_u64p, c_u64p, c_u64p]
            lib.sealtpu_bgv_modtq_many.restype = None
        except AttributeError:  # stale .so without _many
            pass
        _lib = lib
        return _lib


def blake2xb_stream(seed, counter: int, n_bytes: int) -> bytes | None:
    """n_bytes (multiple of 4096) of the blake2xb PRNG stream, or None if
    the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    assert n_bytes % 4096 == 0
    seed_arr = (ctypes.c_uint64 * 8)(*[s & 0xFFFFFFFFFFFFFFFF for s in seed])
    out = (ctypes.c_uint8 * n_bytes)()
    lib.sealtpu_blake2xb_stream(seed_arr, counter, out, n_bytes)
    return bytes(out)


def cbd_from_bytes(raw: bytes, n: int, moduli):
    """Centered-binomial noise rows [L, n] u64 from 6n stream bytes, or
    None if the native library is unavailable (rlwe.sample_poly_cbd tail)."""
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    L = len(moduli)
    q = np.asarray([int(m) for m in moduli], dtype=np.uint64)
    buf = np.frombuffer(raw, dtype=np.uint8, count=6 * n)
    out = np.empty((L, n), dtype=np.uint64)
    lib.sealtpu_cbd(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n,
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), L,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
    return out


def _int_to_words(v: int, width: int):
    import numpy as np

    out = np.empty(width, dtype=np.uint64)
    for w in range(width):
        out[w] = v & 0xFFFFFFFFFFFFFFFF
        v >>= 64
    return out


class CRTComposer:
    """Precomputed native CRT composition for one RNSBase (host hot path of
    CKKS decode; parity rns.cpp:321-399). None-safe: check `.available`."""

    def __init__(self, rns_base):
        import numpy as np

        self.available = get_lib() is not None
        self.L = rns_base.size
        self.W = (rns_base.base_prod.bit_length() + 63) // 64
        if self.W > 66:  # WMAX in rns_native.cpp — C side would no-op
            self.available = False
        self.moduli = np.asarray(rns_base.base, dtype=np.uint64)
        self.y_mul = np.asarray(rns_base.inv_punctured_prod, dtype=np.uint64)
        self.qhat = np.stack(
            [_int_to_words(p, self.W) for p in rns_base.punctured_prod])
        self.Q = _int_to_words(rns_base.base_prod, self.W)
        self.half = _int_to_words((rns_base.base_prod + 1) >> 1, self.W)

    def _ptr(self, arr):
        import numpy as np

        return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))

    def compose_center_f64(self, rows, inv_scale: float):
        """rows: np.uint64 [L, n] residues -> centered doubles * inv_scale,
        or None if the native library is unavailable."""
        import numpy as np

        if not self.available:
            return None
        rows = np.ascontiguousarray(rows, dtype=np.uint64)
        n = rows.shape[1]
        out = np.empty(n, dtype=np.float64)
        get_lib().sealtpu_crt_compose_center_f64(
            self._ptr(rows), self.L, n, self._ptr(self.y_mul),
            self._ptr(self.moduli), self._ptr(self.qhat), self._ptr(self.Q),
            self._ptr(self.half), self.W, ctypes.c_double(inv_scale),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        return out

    def decode_center_ref(self, rows, inv_scale: float):
        """rows: np.uint64 [L, n] residues -> reference-exact CKKS decode
        doubles (ckks.h:694-731 word-wise accumulation), or None if the
        native library is unavailable."""
        import numpy as np

        if not self.available:
            return None
        rows = np.ascontiguousarray(rows, dtype=np.uint64)
        n = rows.shape[1]
        out = np.empty(n, dtype=np.float64)
        get_lib().sealtpu_crt_decode_center_ref(
            self._ptr(rows), self.L, n, self._ptr(self.y_mul),
            self._ptr(self.moduli), self._ptr(self.qhat), self._ptr(self.Q),
            self._ptr(self.half), self.W, ctypes.c_double(inv_scale),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        return out

    def decode_center_ref_many(self, rows, inv_scale: float):
        """rows: np.uint64 [B, L, n] -> [B, n] reference-exact decode
        doubles (one crossing; bit-identical to per-ct decode_center_ref),
        or None if the native library is unavailable."""
        import numpy as np

        if not self.available or not hasattr(
                get_lib(), "sealtpu_crt_decode_center_ref_many"):
            return None
        rows = np.ascontiguousarray(rows, dtype=np.uint64)
        B, _, n = rows.shape
        out = np.empty((B, n), dtype=np.float64)
        get_lib().sealtpu_crt_decode_center_ref_many(
            self._ptr(rows), B, self.L, n, self._ptr(self.y_mul),
            self._ptr(self.moduli), self._ptr(self.qhat), self._ptr(self.Q),
            self._ptr(self.half), self.W, ctypes.c_double(inv_scale),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        return out

    def compose_words(self, rows):
        """rows: np.uint64 [L, n] -> np.uint64 [n, W] little-endian words,
        or None if unavailable."""
        import numpy as np

        if not self.available:
            return None
        rows = np.ascontiguousarray(rows, dtype=np.uint64)
        n = rows.shape[1]
        out = np.empty((n, self.W), dtype=np.uint64)
        get_lib().sealtpu_crt_compose_words(
            self._ptr(rows), self.L, n, self._ptr(self.y_mul),
            self._ptr(self.moduli), self._ptr(self.qhat), self._ptr(self.Q),
            self.W, self._ptr(out),
        )
        return out
