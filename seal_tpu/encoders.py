"""Plaintext encoders.

BatchEncoder parity: seal::BatchEncoder (/root/reference/native/src/seal/
batchencoder.cpp): matrix_reps_index_map (3^i generator order + bit
reversal, :64-88), encode = scatter + inverse negacyclic NTT mod t
(:110-149), decode reverses. The CKKSEncoder lives in ckks.py.
"""

from __future__ import annotations

import numpy as np

from seal_tpu.context import SEALContext
from seal_tpu.dtypes import Plaintext, to_device, to_host
from seal_tpu.encryption_params import SchemeType
from seal_tpu.ops import ntt as ntt_mod
from seal_tpu.utils import numth


class BatchEncoder:
    """SIMD encoder for BFV/BGV: n slots <-> poly coefficients mod t."""

    def __init__(self, context: SEALContext):
        if not context.parameters_set:
            raise ValueError("encryption parameters are not set correctly")
        cd = context.first_context_data()
        if cd.parms.scheme not in (SchemeType.BFV, SchemeType.BGV):
            raise ValueError("unsupported scheme")
        if not cd.qualifiers.using_batching:
            raise ValueError("encryption parameters are not valid for batching")
        self.context = context
        self.slots = cd.parms.poly_modulus_degree
        logn = numth.get_power_of_two(self.slots)
        self._t = cd.parms.plain_modulus.value
        self._tables = cd.plain_ntt_tables

        # index map: 3^i order (rows) + bit reversal (batchencoder.cpp:64-88)
        row_size = self.slots >> 1
        m = self.slots << 1
        index_map = np.zeros(self.slots, dtype=np.int64)
        pos = 1
        for i in range(row_size):
            index1 = (pos - 1) >> 1
            index2 = (m - pos - 1) >> 1
            index_map[i] = numth.reverse_bits(index1, logn)
            index_map[row_size | i] = numth.reverse_bits(index2, logn)
            pos = (pos * 3) & (m - 1)
        self._index_map = index_map
        # native u64 NTT for the plain-modulus transforms (the eager JAX
        # path costs ~100 ms/call in dispatch at n=16384; native is ~0.3 ms)
        from seal_tpu.native.poly import NativePolyOps

        self._npoly = NativePolyOps(self._tables)
        self._scratch = np.empty(self.slots, dtype=np.uint64)

    @property
    def slot_count(self) -> int:
        return self.slots

    def encode(self, values) -> Plaintext:
        t = self._t
        if isinstance(values, np.ndarray) and values.dtype.kind in "iu":
            # fast path: integer ndarrays validate with two scalar
            # reductions instead of the per-element Python boxing of list()
            # (~10x of the whole encode at small n)
            if values.dtype.kind == "u":
                if values.size and int(values.max()) >= t:
                    raise ValueError(
                        "input value is larger than plain_modulus")
                u = values.astype(np.uint64, copy=False)
            else:
                vmin = int(values.min()) if values.size else 0
                vmax = int(values.max()) if values.size else 0
                if vmax >= t or -vmin > (t - 1) // 2:
                    raise ValueError(
                        "input value is larger than plain_modulus")
                if vmin < 0:
                    u = np.mod(values.astype(np.int64, copy=False),
                               t).astype(np.uint64)
                else:
                    u = values.astype(np.uint64)
            if u.size > self.slots:
                raise ValueError("values_matrix size is too large")
        else:
            try:
                v = np.asarray(list(values), dtype=np.int64)  # t < 2^60 fits signed
            except OverflowError:
                raise ValueError("input value is larger than plain_modulus")
            if v.size > self.slots:
                raise ValueError("values_matrix size is too large")
            neg = v < 0
            if np.any(-v[neg] > (t - 1) // 2):  # signed, like the int64 overload
                raise ValueError("input value is larger than plain_modulus")
            u = np.where(neg, v + t, v).astype(np.uint64)
            if np.any(u >= t):
                raise ValueError("input value is larger than plain_modulus")
        npoly = self._npoly
        if npoly.available:
            # scatter + INTT mod t in ONE native call (batchencoder.cpp
            # :110-149 role; the Python zeros+fancy-scatter+wrapper glue
            # previously cost as much as the transform at small n)
            from seal_tpu.native.poly import _p, _pi64

            u = np.ascontiguousarray(u, dtype=np.uint64)
            out_np = np.empty(self.slots, dtype=np.uint64)
            tp = npoly._ptr0
            npoly.lib.sealtpu_batch_encode(
                _p(u), u.size, self.slots, _pi64(self._index_map),
                npoly.log_n, tp["inv_op"], tp["inv_qt"], tp["inv_n_op"],
                tp["inv_n_qt"], tp["last_op"], tp["last_qt"], tp["q"],
                _p(out_np))
            p = Plaintext()
            p.data = out_np
            return p
        coeffs = np.zeros(self.slots, dtype=np.uint64)
        coeffs[self._index_map[: u.size]] = u
        dev = to_device(coeffs.reshape(1, self.slots))
        out = ntt_mod.ntt_inverse_eager(dev, self._tables)
        p = Plaintext(self.slots)
        p.data = to_host(out)[0]
        return p

    def encode_many(self, values_batch) -> list[Plaintext]:
        """Encode B slot vectors in ONE native crossing: values_batch is
        [B, m] (m <= slot_count, integer ndarray or nested sequence) and the
        result is B plaintexts, bit-identical to B encode() calls.

        TPU-native batch-amortized API (no reference counterpart —
        batchencoder.h has only the scalar overloads): the fixed per-call
        Python/ctypes cost that dominates small-n encode is paid once per
        batch instead of once per plaintext."""
        t = self._t
        v = values_batch
        if not (isinstance(v, np.ndarray) and v.dtype.kind in "iu"):
            try:
                v = np.asarray([list(row) for row in v], dtype=np.int64)
            except OverflowError:
                # match the scalar encode()'s error type for huge ints
                raise ValueError(
                    "input value is larger than plain_modulus")
        if v.ndim != 2:
            raise ValueError("values_batch must be [B, m]")
        if v.shape[1] > self.slots:
            raise ValueError("values_matrix size is too large")
        if v.dtype.kind == "u":
            if v.size and int(v.max()) >= t:
                raise ValueError("input value is larger than plain_modulus")
            u = v.astype(np.uint64, copy=False)
        else:
            vmin = int(v.min()) if v.size else 0
            vmax = int(v.max()) if v.size else 0
            if vmax >= t or -vmin > (t - 1) // 2:
                raise ValueError("input value is larger than plain_modulus")
            u = (np.mod(v.astype(np.int64, copy=False), t).astype(np.uint64)
                 if vmin < 0 else v.astype(np.uint64))
        npoly = self._npoly
        if not (npoly.available
                and hasattr(npoly.lib, "sealtpu_batch_encode_many")):
            return [self.encode(row) for row in u]
        from seal_tpu.native.poly import _p, _pi64

        u = np.ascontiguousarray(u, dtype=np.uint64)
        B, m = u.shape
        out_np = np.empty((B, self.slots), dtype=np.uint64)
        tp = npoly._ptr0
        npoly.lib.sealtpu_batch_encode_many(
            _p(u), B, m, self.slots, _pi64(self._index_map), npoly.log_n,
            tp["inv_op"], tp["inv_qt"], tp["inv_n_op"], tp["inv_n_qt"],
            tp["last_op"], tp["last_qt"], tp["q"], _p(out_np))
        plains = []
        for b in range(B):
            p = Plaintext()
            p.data = out_np[b]
            plains.append(p)
        return plains

    def decode_many(self, plains, signed: bool = False) -> np.ndarray:
        """Decode B plaintexts in ONE native crossing -> [B, slot_count]
        (uint64, or int64 when signed). Bit-identical to B decode() calls.
        TPU-native batch-amortized API."""
        plains = list(plains)
        if not plains:
            return np.empty(
                (0, self.slots),
                dtype=np.int64 if signed else np.uint64)
        npoly = self._npoly
        if not (npoly.available
                and hasattr(npoly.lib, "sealtpu_batch_decode_many")):
            return np.stack([self.decode(p, signed) for p in plains])
        B = len(plains)
        data = np.zeros((B, self.slots), dtype=np.uint64)
        for b, p in enumerate(plains):
            if p.is_ntt_form:
                raise ValueError("plain cannot be in NTT form")
            d = p.data
            data[b, : min(len(d), self.slots)] = d[: self.slots]
        from seal_tpu.native.poly import _p, _pi64

        values = np.empty((B, self.slots), dtype=np.uint64)
        tp = npoly._ptr0
        npoly.lib.sealtpu_batch_decode_many(
            _p(data), B, self.slots, _pi64(self._index_map), npoly.log_n,
            tp["fwd_op"], tp["fwd_qt"], tp["q"], _p(self._scratch),
            _p(values))
        if signed:
            t = self._t
            half = (t + 1) >> 1
            return (values.astype(np.int64)
                    - np.where(values >= half, t, 0).astype(np.int64))
        return values

    def decode(self, plain: Plaintext, signed: bool = False):
        if plain.is_ntt_form:
            raise ValueError("plain cannot be in NTT form")
        npoly = self._npoly
        if npoly.available:
            from seal_tpu.native.poly import _p, _pi64

            data = np.ascontiguousarray(plain.data, dtype=np.uint64)
            values = np.empty(self.slots, dtype=np.uint64)
            tp = npoly._ptr0
            npoly.lib.sealtpu_batch_decode(
                _p(data), min(data.size, self.slots), self.slots,
                _pi64(self._index_map), npoly.log_n,
                tp["fwd_op"], tp["fwd_qt"], tp["q"], _p(self._scratch),
                _p(values))
        else:
            coeffs = np.zeros(self.slots, dtype=np.uint64)
            coeffs[: len(plain.data)] = plain.data
            dev = to_device(coeffs.reshape(1, self.slots))
            out = to_host(ntt_mod.ntt_forward_eager(dev, self._tables))[0]
            values = out[self._index_map]
        if signed:
            t = self._t
            half = (t + 1) >> 1
            return (values.astype(np.int64)
                    - np.where(values >= half, t, 0).astype(np.int64))
        # returns np.uint64 [slots] — the TPU-native API (r4; was a Python
        # list, whose construction dominated small-n decode)
        return values
