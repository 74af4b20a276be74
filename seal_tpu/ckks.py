"""CKKSEncoder: canonical embedding C^{n/2} <-> R = Z[X]/(X^n+1).

Parity: seal::CKKSEncoder (/root/reference/native/src/seal/ckks.{h,cpp}):
slot order via the 3^i index map (ckks.cpp:31-50), encode = inverse FFT with
scale/n folded in + round + RNS decompose (magnitude-classed fast paths,
ckks.h:448-630) + NTT; decode = INTT + CRT compose + centered float
reconstruction + forward FFT (ckks.h:635-737).

Design note: the reference runs a hand-rolled complex-double DWT butterfly
(util/dwthandler.h specialized over complex doubles). Mathematically the
encode/decode maps are evaluations of the polynomial at the odd powers
ψ^{3^i} of the primitive 2n-th complex root; here they are computed with a
twist + numpy FFT — same map, different floating-point rounding order.
CKKS is approximate by construction and the reference's own tests bound the
error (tests/seal/ckks.cpp), which these match.
"""

from __future__ import annotations

import numpy as np

from seal_tpu.context import SEALContext
from seal_tpu.dtypes import Plaintext, to_device, to_host
from seal_tpu.encryption_params import SchemeType
from seal_tpu.ops import ntt as ntt_mod


class CKKSEncoder:
    def __init__(self, context: SEALContext):
        if not context.parameters_set:
            raise ValueError("encryption parameters are not set correctly")
        cd = context.first_context_data()
        if cd.parms.scheme != SchemeType.CKKS:
            raise ValueError("unsupported scheme")
        self.context = context
        n = cd.parms.poly_modulus_degree
        self.n = n
        self.slots = n >> 1
        m = 2 * n
        # slot i evaluates at ψ^{3^i}; exponents for the FFT bins
        pos = 1
        exps = np.empty(self.slots, dtype=np.int64)
        for i in range(self.slots):
            exps[i] = (pos - 1) >> 1   # ev bin k: root ψ^{2k+1} = ψ^{pos}
            pos = (pos * 3) & (m - 1)
        self._slot_bins = exps
        j = np.arange(n)
        self._twist = np.exp(1j * np.pi * j / n)        # ψ^j
        self._itwist = np.exp(-1j * np.pi * j / n)      # ψ^{-j}

    @property
    def slot_count(self) -> int:
        return self.slots

    # -- encode --------------------------------------------------------------------

    def encode(self, values, scale: float, parms_id=None) -> Plaintext:
        """values: scalars / sequence of real or complex, up to n/2 slots."""
        ctx = self.context
        if parms_id is None:
            parms_id = ctx.first_parms_id
        cd = ctx.get_context_data(parms_id)
        if cd is None:
            raise ValueError("parms_id is not valid for encryption parameters")
        if np.isscalar(values):
            values = [values] * self.slots
        values = np.asarray(values, dtype=np.complex128)
        if values.size > self.slots:
            raise ValueError("values_size is too large")
        if scale <= 0 or (int(np.log2(scale)) + 1) >= cd.total_coeff_modulus_bit_count:
            raise ValueError("scale out of bounds")

        n = self.n
        ev = np.zeros(self.slots, dtype=np.complex128)
        ev_bins = np.zeros(n, dtype=np.complex128)
        ev[: values.size] = values
        ev_bins[self._slot_bins] = ev
        # conjugate bins: ψ^{m-pos} = conj(ψ^{pos}): bin (m-pos-1)/2 = n-1-k
        ev_bins[n - 1 - self._slot_bins] = np.conj(ev)
        # c_j = (scale/n) ψ^{-j} FFT(ev)_j
        coeffs = (scale / n) * self._itwist * np.fft.fft(ev_bins)
        coeffd = np.round(coeffs.real)

        max_coeff = float(np.max(np.abs(coeffd))) if coeffd.size else 0.0
        max_bits = int(np.ceil(np.log2(max(max_coeff, 1.0)))) + 1
        if max_bits >= cd.total_coeff_modulus_bit_count:
            raise ValueError("encoded values are too large")

        moduli = cd.key_moduli()
        rows = np.zeros((len(moduli), n), dtype=np.uint64)
        if max_bits <= 52:
            # every |coeff| fits a double's integer range exactly
            iv = coeffd.astype(np.int64)
            for j, q in enumerate(moduli):
                rows[j] = np.mod(iv, q).astype(np.uint64)
        else:
            for i, v in enumerate(coeffd.tolist()):
                iv = int(v)
                for j, q in enumerate(moduli):
                    rows[j, i] = iv % q
        dev = ntt_mod.ntt_forward(to_device(rows), cd.ntt_tables)
        p = Plaintext()
        p.rns_data = dev
        p.parms_id = tuple(parms_id)
        p.scale = float(scale)
        return p

    # -- decode ---------------------------------------------------------------------

    def decode(self, plain: Plaintext, complex_out: bool = False):
        if plain.rns_data is None or not plain.is_ntt_form:
            raise ValueError("plain is not valid for CKKS decoding")
        cd = self.context.get_context_data(plain.parms_id)
        if cd is None:
            raise ValueError("plain is not valid for encryption parameters")
        n = self.n
        rows = to_host(ntt_mod.ntt_inverse(plain.rns_data, cd.ntt_tables))
        Q = cd.total_coeff_modulus
        base = cd.rns_base
        half = cd.upper_half_threshold
        inv_scale = 1.0 / plain.scale
        # native C++ CRT composition when available (seal_tpu.native);
        # exact-big-int Python fallback otherwise
        composer = getattr(cd, "_crt_composer", None)
        if composer is None:
            from seal_tpu.native import CRTComposer

            composer = CRTComposer(base)
            cd._crt_composer = composer
        vals = composer.compose_center_f64(rows, inv_scale)
        if vals is None:
            vals = np.empty(n, dtype=np.float64)
            for i in range(n):
                v = base.compose([int(x) for x in rows[:, i]])
                if v >= half:
                    v -= Q
                vals[i] = float(v) * inv_scale
        # ev_k = m(ψ^{2k+1}) = n · IFFT(c_j ψ^j)_k
        ev = n * np.fft.ifft(vals * self._twist)
        out = ev[self._slot_bins]
        if complex_out:
            return out
        # real decode drops the ~1e-9 imaginary dust (parity: ckks.h decode
        # for vector<double> keeps only the real part)
        return out.real
