"""CKKSEncoder: canonical embedding C^{n/2} <-> R = Z[X]/(X^n+1).

Parity: seal::CKKSEncoder (/root/reference/native/src/seal/ckks.{h,cpp}):
slot order via the 3^i index map (ckks.cpp:31-50), encode = inverse FFT with
scale/n folded in + round + RNS decompose (magnitude-classed fast paths,
ckks.h:448-630) + NTT; decode = INTT + CRT compose + centered float
reconstruction + forward FFT (ckks.h:635-737).

The host encode/decode replays the reference's complex-double DWT butterfly
engine operation-for-operation (utils/dwt.py; util/dwthandler.h specialized
over complex doubles, root tables from util/croots.cpp), so vector encodes
and decodes are bit-identical to the reference — including the float64
rounding.  The df64 *device* paths remain an independent implementation of
the same map (valid CKKS encodings, different rounding order, like any
other CKKS library).
"""

from __future__ import annotations

import math

import numpy as np

from seal_tpu.context import SEALContext
from seal_tpu.dtypes import Plaintext, to_device, to_host
from seal_tpu.encryption_params import SchemeType
from seal_tpu.ops import ntt as ntt_mod
from seal_tpu.utils import dwt, numth


def _center_accumulate_ref(v: int, Q: int, half: int, inv_scale: float) -> float:
    """Python fallback mirroring ckks.h:698-731 word-for-word: signed
    per-64-bit-word double accumulation of the centered composed value."""
    res = 0.0
    s = inv_scale
    mask = (1 << 64) - 1
    two_pow_64 = 18446744073709551616.0
    if v >= half:
        w, qw = v, Q
        while w or qw:
            a, b = w & mask, qw & mask
            if a > b:
                d = a - b
                res += float(d) * s if d else 0.0
            else:
                d = b - a
                res -= float(d) * s if d else 0.0
            s *= two_pow_64
            w >>= 64
            qw >>= 64
    else:
        w = v
        while w:
            d = w & mask
            res += float(d) * s if d else 0.0
            s *= two_pow_64
            w >>= 64
    return res


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
        log_n = n.bit_length() - 1
        self._log_n = log_n
        self._bitrev = np.array([numth.reverse_bits(i, log_n) for i in range(n)])
        # matrix_reps_index_map_ (ckks.cpp:31-50): bit-reversed slot -> bin
        # placement for the reference-exact DWT paths.  First half carries the
        # values, second half the conjugates.
        self._index_map = np.concatenate(
            [self._bitrev[exps], self._bitrev[n - 1 - exps]])
        self._roots = None        # lazily built (root_powers, inv_root_powers)
        self._dev = None          # lazily built device-FFT bundle
        self._dev_fns = {}        # jitted (parms_id -> encode/decode) cache

    def _root_tables(self):
        if self._roots is None:
            self._roots = dwt.encoder_root_tables(self.n)
        return self._roots

    @property
    def slot_count(self) -> int:
        return self.slots

    # -- device FFT bundle ---------------------------------------------------

    def _device_bundle(self):
        """Twiddle + twist tables for the df64 device encoder (built once)."""
        if self._dev is None:
            import jax.numpy as jnp
            from seal_tpu.ops import cfft

            n = self.n
            enc_t = cfft.build_cfft_tables(self._log_n)
            dec_t = cfft.build_cfft_tables(self._log_n, conj=True)
            j = np.arange(n)
            # encode: coeffs = scale * [ (1/n) ψ^{-j} FFT(bins) ]_re
            tw = np.exp(-1j * np.pi * j / n) / n
            enc_tw = tuple(jnp.asarray(a) for a in
                           (cfft.df_from_f64(tw.real) + cfft.df_from_f64(tw.imag)))
            # decode: ev = conjFFT(vals * ψ^{j}) (DIF, bit-reversed out)
            tw2 = np.exp(1j * np.pi * j / n)
            dec_tw = tuple(jnp.asarray(a) for a in
                           (cfft.df_from_f64(tw2.real) + cfft.df_from_f64(tw2.imag)))
            self._dev = dict(enc_t=enc_t, dec_t=dec_t, enc_tw=enc_tw, dec_tw=dec_tw)
        return self._dev

    def _device_bundle_tf(self):
        """Triple-float twiddle + twist tables for the extended-range device
        encoder (|coeff| up to ~2^56; ops/cfft_tf.py). Built lazily: only
        encodes at scale >= 2^46 pay the Decimal table generation."""
        if getattr(self, "_dev_tf", None) is None:
            import jax.numpy as jnp
            from seal_tpu.ops import cfft_tf

            n = self.n
            enc_t = cfft_tf.build_tf_tables(self._log_n)
            # twist: e^{-i*pi*j/n} / n — high-precision roots on the 2n-circle,
            # the 1/n scaling is a power of two (exact per component)
            j = np.arange(n)
            cos3, sin3 = cfft_tf._tf_roots(2 * n, j)
            inv_n = np.float32(1.0 / n)
            tw = tuple(jnp.asarray(a * inv_n) for a in cos3) + \
                tuple(jnp.asarray(-a * inv_n) for a in sin3)
            self._dev_tf = dict(enc_t=enc_t, enc_tw=tw)
        return self._dev_tf

    # -- encode --------------------------------------------------------------------

    def _encode_constant(self, coeff: int, parms_id, scale: float) -> Plaintext:
        """Exact constant-polynomial plaintext: a constant's NTT is the same
        value in every slot, so the rows are plain fills — no FFT, no
        rounding (parity: ckks.cpp:75-214 double overload, :216-270 int64)."""
        cd = self.context.get_context_data(parms_id)
        bits = abs(coeff).bit_length() + 2
        if bits >= cd.total_coeff_modulus_bit_count:
            raise ValueError("encoded value is too large")
        rows = np.empty((cd.coeff_modulus_size, self.n), dtype=np.uint64)
        for j, q in enumerate(cd.key_moduli()):
            rows[j, :] = coeff % q
        p = Plaintext()
        p.rns_data = to_device(rows)
        p.parms_id = tuple(parms_id)
        p.scale = float(scale)
        return p

    def encode_int(self, value: int, parms_id=None) -> Plaintext:
        """Exact integer encode with scale 1 (parity: ckks.cpp:216-270)."""
        ctx = self.context
        if parms_id is None:
            parms_id = ctx.first_parms_id
        if ctx.get_context_data(parms_id) is None:
            raise ValueError("parms_id is not valid for encryption parameters")
        return self._encode_constant(int(value), parms_id, 1.0)

    def encode(self, values, scale: float, parms_id=None) -> Plaintext:
        """values: scalars / sequence of real or complex, up to n/2 slots."""
        ctx = self.context
        if parms_id is None:
            parms_id = ctx.first_parms_id
        cd = ctx.get_context_data(parms_id)
        if cd is None:
            raise ValueError("parms_id is not valid for encryption parameters")
        if np.isscalar(values) and not isinstance(values, complex):
            # real scalar: exact constant fill (ckks.cpp:75-214), not FFT;
            # C++ std::round = half away from zero (ckks.cpp:124)
            if scale <= 0 or (int(np.log2(scale)) + 1) >= cd.total_coeff_modulus_bit_count:
                raise ValueError("scale out of bounds")
            return self._encode_constant(
                dwt.round_half_away_scalar(float(values) * scale), parms_id, scale)
        if np.isscalar(values):
            values = [values] * self.slots
        values = np.asarray(values, dtype=np.complex128)
        if values.size > self.slots:
            raise ValueError("values_size is too large")
        if scale <= 0 or (int(np.log2(scale)) + 1) >= cd.total_coeff_modulus_bit_count:
            raise ValueError("scale out of bounds")

        # reference-exact inverse DWT (ckks.h:493-502): values into the
        # bit-reversed index map, conjugates in the upper half, scale/n
        # merged into the last butterfly stage
        n = self.n
        re = np.zeros(n, dtype=np.float64)
        im = np.zeros(n, dtype=np.float64)
        k = values.size
        re[self._index_map[:k]] = values.real
        im[self._index_map[:k]] = values.imag
        re[self._index_map[self.slots: self.slots + k]] = values.real
        im[self._index_map[self.slots: self.slots + k]] = -values.imag
        fix = scale / float(n)
        _, inv_roots = self._root_tables()
        dwt.transform_from_rev(re, im, inv_roots, scalar=fix)

        # max bit count from the UNROUNDED magnitudes (ckks.h:504-515)
        max_coeff = float(np.max(np.fabs(re))) if n else 0.0
        max_bits = int(math.ceil(math.log2(max(max_coeff, 1.0)))) + 1
        if max_bits >= cd.total_coeff_modulus_bit_count:
            raise ValueError("encoded values are too large")

        coeffd = dwt.round_half_away(re)   # std::round semantics
        moduli = cd.key_moduli()
        from seal_tpu.dtypes import _LazyHostData
        from seal_tpu.native import poly as native_poly

        npoly = native_poly.for_context_data(cd)
        rows = None
        if max_bits <= 63:
            # integral float64 -> int64 is exact below 2^63; iv % q equals
            # the reference's negate_uint_mod(barrett_reduce_64(|v|))
            iv = np.ascontiguousarray(coeffd.astype(np.int64))
            if npoly is not None:
                # Barrett in C (the numpy int64 hardware division was the
                # dominant cost of large-n encode, r4)
                rows = np.empty((len(moduli), n), dtype=np.uint64)
                npoly.lib.sealtpu_reduce_signed_rows(
                    native_poly._pi64(iv), n, len(moduli),
                    npoly._ptr0["q"], npoly._ptr0["r1"],
                    native_poly._p(rows))
            else:
                rows = np.zeros((len(moduli), n), dtype=np.uint64)
                for j, q in enumerate(moduli):
                    rows[j] = np.mod(iv, q).astype(np.uint64)
        else:
            rows = np.zeros((len(moduli), n), dtype=np.uint64)
            for i, v in enumerate(coeffd.tolist()):
                iv = int(v)
                for j, q in enumerate(moduli):
                    rows[j, i] = iv % q
        p = Plaintext()
        if npoly is not None:
            # LAZY device data: the host API (encode -> encrypt -> ...)
            # never pays the jax boundary; first device use materializes
            host_rows = npoly.ntt_forward(np.ascontiguousarray(rows))
            p.rns_data = _LazyHostData(host_rows)
        else:
            p.rns_data = ntt_mod.ntt_forward_eager(
                to_device(rows), cd.ntt_tables)
        p.parms_id = tuple(parms_id)
        p.scale = float(scale)
        return p

    # -- batch-amortized host paths (TPU-native API; ckks.h has only the
    #    scalar overloads). Bit-identical to sequential encode/decode. -----

    def encode_many(self, values_batch, scale: float,
                    parms_id=None) -> list[Plaintext]:
        """Encode B slot vectors [B, m] at one common scale with ONE native
        crossing per kernel (DWT, signed reduce, NTT). Bit-identical to
        [encode(v, scale) for v in values_batch]."""
        ctx = self.context
        if parms_id is None:
            parms_id = ctx.first_parms_id
        cd = ctx.get_context_data(parms_id)
        if cd is None:
            raise ValueError("parms_id is not valid for encryption parameters")
        v = np.asarray(values_batch, dtype=np.complex128)
        if v.ndim != 2:
            raise ValueError("values_batch must be [B, m]")
        B, k = v.shape
        if k > self.slots:
            raise ValueError("values_size is too large")
        if scale <= 0 or (int(np.log2(scale)) + 1) >= \
                cd.total_coeff_modulus_bit_count:
            raise ValueError("scale out of bounds")
        from seal_tpu.native import poly as native_poly

        npoly = native_poly.for_context_data(cd)
        if npoly is None or not hasattr(npoly.lib,
                                        "sealtpu_reduce_signed_rows_many"):
            return [self.encode(row, scale, parms_id) for row in v]

        n = self.n
        L = len(cd.key_moduli())
        import ctypes

        from seal_tpu.native.poly import _p, _pi64

        f64p = ctypes.POINTER(ctypes.c_double)
        lib = npoly.lib
        fused = hasattr(lib, "sealtpu_ckks_scatter_many")
        re = np.empty((B, n), dtype=np.float64)
        im = np.empty((B, n), dtype=np.float64)
        if fused:
            # scatter + conjugate fill in ONE crossing (the numpy fancy
            # scatter cost ~8 us/ct at n=1024 — more than the FFT)
            vre = np.ascontiguousarray(v.real)
            vim = np.ascontiguousarray(v.imag)
            lib.sealtpu_ckks_scatter_many(
                vre.ctypes.data_as(f64p), vim.ctypes.data_as(f64p), B, k,
                self.slots, n, _pi64(self._index_map),
                re.ctypes.data_as(f64p), im.ctypes.data_as(f64p))
        else:
            re[:] = 0.0
            im[:] = 0.0
            re[:, self._index_map[:k]] = v.real
            im[:, self._index_map[:k]] = v.imag
            re[:, self._index_map[self.slots: self.slots + k]] = v.real
            im[:, self._index_map[self.slots: self.slots + k]] = -v.imag
        fix = scale / float(n)
        _, inv_roots = self._root_tables()
        dwt.transform_from_rev_many(re, im, inv_roots, scalar=fix)

        if fused:
            rows = np.empty((B, L, n), dtype=np.uint64)
            max_coeff = np.empty(B, dtype=np.float64)
            lib.sealtpu_ckks_round_reduce_many(
                re.ctypes.data_as(f64p), B, n, L, npoly._ptr0["q"],
                npoly._ptr0["r1"], _p(rows),
                max_coeff.ctypes.data_as(f64p))
        else:
            max_coeff = np.max(np.fabs(re), axis=1) if n else np.zeros(B)
        max_bits = np.asarray([
            int(math.ceil(math.log2(max(float(m), 1.0)))) + 1
            for m in max_coeff])
        if np.any(max_bits >= cd.total_coeff_modulus_bit_count):
            raise ValueError("encoded values are too large")
        if np.any(max_coeff >= 2.0 ** 62) or np.any(max_bits > 63):
            # rare big-coefficient rows take the exact big-int path; the
            # first condition mirrors the native kernel's skip threshold
            # EXACTLY (sealtpu_ckks_round_reduce_many leaves rows whose
            # max reaches 2^62 unwritten — the int64 cast would be UB)
            return [self.encode(row, scale, parms_id) for row in v]
        if not fused:
            coeffd = dwt.round_half_away(re)
            iv = np.ascontiguousarray(coeffd.astype(np.int64))
            rows = npoly.reduce_signed_rows_many(iv, L)
        npoly.ntt_forward_many(rows)
        from seal_tpu.dtypes import _LazyHostData

        plains = []
        for b in range(B):
            p = Plaintext()
            p.rns_data = _LazyHostData(rows[b])
            p.parms_id = tuple(parms_id)
            p.scale = float(scale)
            plains.append(p)
        return plains

    def decode_many(self, plains, complex_out: bool = False) -> np.ndarray:
        """Decode B plaintexts (one common level and scale) -> [B, slots]
        with ONE native crossing per kernel. Bit-identical to
        [decode(p) for p in plains]; mixed levels/scales fall back to
        sequential decode."""
        plains = list(plains)
        if not plains:
            return np.empty((0, self.slots))
        pid = tuple(plains[0].parms_id)
        scale = plains[0].scale
        uniform = all(
            p.rns_data is not None and p.is_ntt_form
            and tuple(p.parms_id) == pid and p.scale == scale
            for p in plains)
        cd = self.context.get_context_data(pid) if uniform else None
        from seal_tpu.native import poly as native_poly

        npoly = (native_poly.for_context_data(cd)
                 if cd is not None else None)
        if npoly is None or not hasattr(npoly.lib, "sealtpu_phase2_many"):
            return np.stack(
                [self.decode(p, complex_out) for p in plains])
        B, n = len(plains), self.n
        L = cd.coeff_modulus_size
        rows = np.empty((B, L, n), dtype=np.uint64)
        for b, p in enumerate(plains):
            host = p.host_rns_u64()
            rows[b] = (host if host is not None
                       else np.ascontiguousarray(to_host(p.rns_data)))
        npoly.ntt_inverse_many(rows)
        composer = getattr(cd, "_crt_composer", None)
        if composer is None:
            from seal_tpu.native import CRTComposer

            composer = CRTComposer(cd.rns_base)
            cd._crt_composer = composer
        vals = composer.decode_center_ref_many(rows, 1.0 / scale)
        if vals is None:
            return np.stack(
                [self.decode(p, complex_out) for p in plains])
        im = np.zeros((B, n), dtype=np.float64)
        roots, _ = self._root_tables()
        dwt.transform_to_rev_many(vals, im, roots)
        sel = self._index_map[: self.slots]
        if complex_out:
            return vals[:, sel] + 1j * im[:, sel]
        return vals[:, sel]

    # -- device paths (df64 FFT, VERDICT r1 item 4) ----------------------------------

    def _encode_fn(self, parms_id):
        """Jitted device encode: df64 FFT → twist·scale → round → RNS rows →
        NTT, all in one executable (host does only the O(n) bin permute)."""
        key = ("enc", parms_id)
        if key not in self._dev_fns:
            import jax
            import jax.numpy as jnp
            from seal_tpu.ops import cfft, limb

            cd = self.context.get_context_data(parms_id)
            bundle = self._device_bundle()
            tables = cd.ntt_tables
            mc = cd.mod_consts
            L = cd.coeff_modulus_size
            n = self.n

            def f(b4, scale_pair):
                y = cfft.fft_dit_bitrev_in(b4, bundle["enc_t"])
                c = cfft.cmul(y, bundle["enc_tw"])
                re = cfft.df_mul(c[:2], scale_pair)
                neg, v = cfft.df_round_to_u64_pair(re[0], re[1])
                vb = (jnp.broadcast_to(v[0][None, :], (L, n)),
                      jnp.broadcast_to(v[1][None, :], (L, n)))
                rows = limb.barrett_reduce_64(vb, mc.q, mc.ratio1)
                rows = limb.select64(neg[None, :], limb.neg_mod(rows, mc.q), rows)
                return ntt_mod.ntt_forward(rows, tables)

            self._dev_fns[key] = jax.jit(f)
        return self._dev_fns[key]

    def _encode_fn_tf(self, parms_id):
        """Jitted triple-float device encode (ops/cfft_tf.py): exact integer
        rounding for |coeff| up to ~2^56 (VERDICT r3 item 4 — the reference
        encoder is all-double with no 2^46 cliff, ckks.h:494-519)."""
        key = ("enc_tf", parms_id)
        if key not in self._dev_fns:
            import jax
            import jax.numpy as jnp
            from seal_tpu.ops import cfft_tf, limb

            cd = self.context.get_context_data(parms_id)
            bundle = self._device_bundle_tf()
            tables = cd.ntt_tables
            mc = cd.mod_consts
            L = cd.coeff_modulus_size
            n = self.n

            def f(b6, scale3):
                y = cfft_tf.fft_dit_bitrev_in_tf(b6, bundle["enc_t"])
                c = cfft_tf.tf_cmul(y, bundle["enc_tw"])
                re = cfft_tf.tf_mul(c[:3], scale3)
                neg, v = cfft_tf.tf_round_to_u64_pair(re)
                vb = (jnp.broadcast_to(v[0][None, :], (L, n)),
                      jnp.broadcast_to(v[1][None, :], (L, n)))
                rows = limb.barrett_reduce_64(vb, mc.q, mc.ratio1)
                rows = limb.select64(neg[None, :], limb.neg_mod(rows, mc.q), rows)
                return ntt_mod.ntt_forward(rows, tables)

            self._dev_fns[key] = jax.jit(f)
        return self._dev_fns[key]

    def encode_device(self, values, scale: float, parms_id=None) -> Plaintext:
        """Device-side encode. Bit-compatible in distribution with the host
        path (both are valid CKKS encodings; rounding order differs — like
        host-vs-reference). Routes by coefficient magnitude: df64 FFT while
        |coeff| < 2^46 (fastest), triple-float FFT to ~2^56 (r4 — covers
        scale 2^50 pipelines that previously fell back), host beyond."""
        import jax.numpy as jnp
        from seal_tpu.ops import cfft

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
        vmax = float(np.max(np.abs(values))) if values.size else 0.0
        # |coeff_j| = |avg of bin values| <= max|v|; df64 needs < 2^46 for
        # exact rounding (abs error ~|coeff|·2^-48 < 0.5); the triple-float
        # route carries ~71 bits -> exact to ~2^56 at any supported n
        mag = scale * max(vmax, 1.0)
        if mag >= 2.0 ** 56:
            return self.encode(values, scale, parms_id)

        n = self.n
        ev = np.zeros(self.slots, dtype=np.complex128)
        ev[: values.size] = values
        ev_bins = np.zeros(n, dtype=np.complex128)
        ev_bins[self._slot_bins] = ev
        ev_bins[n - 1 - self._slot_bins] = np.conj(ev)
        bins_rev = ev_bins[self._bitrev]
        if mag >= 2.0 ** 46:
            from seal_tpu.ops import cfft_tf

            b6 = tuple(jnp.asarray(a) for a in
                       (cfft_tf.tf_from_f64(bins_rev.real)
                        + cfft_tf.tf_from_f64(bins_rev.imag)))
            s3 = tuple(jnp.float32(a) for a in
                       cfft_tf.tf_from_f64(np.float64(scale)))
            dev = self._encode_fn_tf(tuple(parms_id))(b6, s3)
        else:
            b4 = tuple(jnp.asarray(a) for a in
                       (cfft.df_from_f64(bins_rev.real) + cfft.df_from_f64(bins_rev.imag)))
            s_hi, s_lo = cfft.df_from_f64(np.float64(scale))
            dev = self._encode_fn(tuple(parms_id))(
                b4, (jnp.float32(s_hi), jnp.float32(s_lo)))
        p = Plaintext()
        p.rns_data = dev
        p.parms_id = tuple(parms_id)
        p.scale = float(scale)
        return p

    def _decode_fn(self, parms_id):
        """Jitted device decode: INTT → exact multiword CRT compose →
        center → df64 → ×1/scale → twist → DIF FFT (bit-reversed out)."""
        key = ("dec", parms_id)
        if key not in self._dev_fns:
            import jax
            import jax.numpy as jnp
            from seal_tpu.ops import cfft, limb, modring

            cd = self.context.get_context_data(parms_id)
            bundle = self._device_bundle()
            base = cd.rns_base
            moduli = cd.key_moduli()
            L = len(moduli)
            Q = base.base_prod
            W = (Q.bit_length() + 31) // 32
            W_acc = W + 2

            def limbs_of(x, w):
                return tuple(
                    jnp.asarray([(x >> (32 * k)) & 0xFFFFFFFF], dtype=jnp.uint32)
                    for k in range(w))

            y_op, y_qt = modring.shoup_pair(
                [[v] for v in base.inv_punctured_prod],
                [[q] for q in moduli], shape=(L, 1))
            P_limbs = [limbs_of(Q // q, W) for q in moduli]
            Q_acc = limbs_of(Q, W_acc)
            half_acc = limbs_of((Q + 1) >> 1, W_acc)
            mc = cd.mod_consts
            tables = cd.ntt_tables
            pow32 = [cfft.df_from_f64(float(2.0 ** (32 * k))) for k in range(4)]

            def f(rns_pair, inv_scale_pair):
                rows = ntt_mod.ntt_inverse(rns_pair, tables)
                s = limb.mul_mod_shoup(rows, y_op, y_qt, mc.q)
                nshape = rows[0].shape[-1]
                acc = tuple(jnp.zeros((nshape,), jnp.uint32) for _ in range(W_acc))
                for j in range(L):
                    prod = limb.mul_limbs((s[0][j], s[1][j]), P_limbs[j])
                    acc = limb.add_limbs(acc, prod, out_len=W_acc)
                for _ in range(L.bit_length()):
                    # acc < L·Q: halving-style conditional subtracts suffice
                    ge = limb.ge_limbs(acc, Q_acc)
                    acc = limb.select_limbs(ge, limb.sub_limbs(acc, Q_acc), acc)
                # one more pass to guarantee < Q
                ge = limb.ge_limbs(acc, Q_acc)
                acc = limb.select_limbs(ge, limb.sub_limbs(acc, Q_acc), acc)
                neg = limb.ge_limbs(acc, half_acc)
                mag = limb.select_limbs(neg, limb.sub_limbs(Q_acc, acc), acc)
                val = (jnp.zeros((nshape,), jnp.float32),) * 2
                for k in range(4):
                    term = cfft.df_mul(
                        cfft.u32_to_df(mag[k]),
                        (jnp.float32(pow32[k][0]), jnp.float32(pow32[k][1])))
                    val = cfft.df_add(val, term)
                val = cfft.df_mul(val, inv_scale_pair)
                vr = (jnp.where(neg, -val[0], val[0]),
                      jnp.where(neg, -val[1], val[1]))
                z = jnp.zeros_like(vr[0])
                c4 = cfft.cmul((vr[0], vr[1], z, z), bundle["dec_tw"])
                return cfft.fft_dif_bitrev_out(c4, bundle["dec_t"])

            self._dev_fns[key] = jax.jit(f)
        return self._dev_fns[key]

    def decode_device(self, plain: Plaintext, complex_out: bool = False):
        """Device-side decode; host does only the final bin permutation."""
        import jax.numpy as jnp
        from seal_tpu.ops import cfft

        if plain.rns_data is None or not plain.is_ntt_form:
            raise ValueError("plain is not valid for CKKS decoding")
        cd = self.context.get_context_data(plain.parms_id)
        if cd is None:
            raise ValueError("plain is not valid for encryption parameters")
        i_hi, i_lo = cfft.df_from_f64(1.0 / np.float64(plain.scale))
        out4 = self._decode_fn(tuple(plain.parms_id))(
            plain.rns_data, (jnp.float32(i_hi), jnp.float32(i_lo)))
        bins_rev = (
            np.asarray(out4[0], np.float64) + np.asarray(out4[1], np.float64)
        ) + 1j * (
            np.asarray(out4[2], np.float64) + np.asarray(out4[3], np.float64)
        )
        natural = bins_rev[self._bitrev]     # DIF out[j] = X[rev(j)]
        out = natural[self._slot_bins]
        if complex_out:
            return out
        return out.real

    # -- decode ---------------------------------------------------------------------

    def decode(self, plain: Plaintext, complex_out: bool = False):
        if plain.rns_data is None or not plain.is_ntt_form:
            raise ValueError("plain is not valid for CKKS decoding")
        cd = self.context.get_context_data(plain.parms_id)
        if cd is None:
            raise ValueError("plain is not valid for encryption parameters")
        n = self.n
        from seal_tpu.native import poly as native_poly

        npoly = native_poly.for_context_data(cd)
        if npoly is not None:
            host = plain.host_rns_u64()
            rows = (host.copy() if host is not None
                    else np.ascontiguousarray(to_host(plain.rns_data)))
            rows = npoly.ntt_inverse(rows)
        else:
            rows = to_host(
                ntt_mod.ntt_inverse_eager(plain.rns_data, cd.ntt_tables))
        Q = cd.total_coeff_modulus
        base = cd.rns_base
        half = cd.upper_half_threshold
        inv_scale = 1.0 / plain.scale
        # reference-exact float reconstruction (ckks.h:694-731): CRT-compose
        # to words, then per-word signed double accumulation with
        # scaled_two_pow_64 = inv_scale * 2^64j.  Native C++ when available,
        # exact-big-int Python fallback otherwise.
        composer = getattr(cd, "_crt_composer", None)
        if composer is None:
            from seal_tpu.native import CRTComposer

            composer = CRTComposer(base)
            cd._crt_composer = composer
        vals = composer.decode_center_ref(rows, inv_scale)
        if vals is None:
            vals = np.empty(n, dtype=np.float64)
            for i in range(n):
                v = base.compose([int(x) for x in rows[:, i]])
                vals[i] = _center_accumulate_ref(v, Q, half, inv_scale)
        # forward DWT over the centered doubles (ckks.h:733), then read the
        # slots back through the index map
        im = np.zeros(n, dtype=np.float64)
        roots, _ = self._root_tables()
        dwt.transform_to_rev(vals, im, roots)
        sel = self._index_map[: self.slots]
        if complex_out:
            return vals[sel] + 1j * im[sel]
        # real decode keeps only the real part (ckks.h from_complex<double>)
        return vals[sel]
