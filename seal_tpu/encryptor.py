"""Encryptor: public- and secret-key encryption for BFV/CKKS/BGV.

Parity: seal::Encryptor (/root/reference/native/src/seal/encryptor.cpp):
encrypt_zero_internal :88 (with the modulus-switch-down path for data-level
encryption), encrypt_internal :175-253 (BFV Δ-scaling embed, CKKS NTT-plain
add, BGV plain add).
"""

from __future__ import annotations

import numpy as np

from seal_tpu import rlwe
from seal_tpu.context import SEALContext
from seal_tpu.dtypes import Ciphertext, Plaintext, PublicKey, SecretKey, to_device, to_host
from seal_tpu.encryption_params import SchemeType
from seal_tpu.ops import modring, rns as rns_ops
from seal_tpu.ops import ntt as ntt_mod


def _scaled_plain_rows(plain: Plaintext, cd) -> np.ndarray:
    """Host: Δ·m + rounding fix per RNS row, uint64 [L, N]
    (parity: util/scalingvariant.cpp:69-113). Native single pass when
    available (the Python n·L big-int loop costs ~0.3 s at n=16384)."""
    import ctypes

    from seal_tpu import native

    parms = cd.parms
    t = parms.plain_modulus.value
    moduli = cd.key_moduli()
    n = parms.poly_modulus_degree
    q_mod_t = cd.coeff_modulus_mod_plain_modulus
    half_t = cd.plain_upper_half_threshold
    delta = cd.coeff_div_plain_modulus
    out = np.zeros((len(moduli), n), dtype=np.uint64)
    lib = native.get_lib()
    if lib is not None and hasattr(lib, "sealtpu_scaled_plain"):
        m_arr = np.ascontiguousarray(plain.data, dtype=np.uint64)
        q_arr = np.asarray([int(q) for q in moduli], dtype=np.uint64)
        d_arr = np.asarray([int(d) for d in delta], dtype=np.uint64)
        p = ctypes.POINTER(ctypes.c_uint64)
        lib.sealtpu_scaled_plain(
            m_arr.ctypes.data_as(p), m_arr.size, len(moduli), n,
            q_arr.ctypes.data_as(p), d_arr.ctypes.data_as(p),
            int(q_mod_t), int(half_t), int(t),
            out.ctypes.data_as(p))
        return out
    for i, m in enumerate(plain.data.tolist()):
        if i >= n:
            break
        fix = (q_mod_t * m + half_t) // t
        for j, q in enumerate(moduli):
            out[j, i] = (delta[j] * m + fix) % q
    return out


# Cached-jit mod-switch-down for encrypt_zero at sub-key levels: ONE
# executable per (backend, level, ct size, form) instead of per-poly eager
# divide/mod_down pipelines (part of the measured multi-second eager
# encrypt at n=16384). Bit-identical: the same kernels, traced.
_ez_msd_cache: dict = {}


def _ez_mod_switch_fn(ctx, cd, prev_cd, scheme, is_ntt_form: bool, size: int):
    import jax

    dd = jax.config.jax_default_device
    plat = (dd if isinstance(dd, str) else dd.platform) if dd is not None \
        else jax.default_backend()
    key = (plat, tuple(cd.parms_id), size, is_ntt_form)
    fn = _ez_msd_cache.get(key)
    if fn is None:
        from seal_tpu.dtypes import stack_polys

        alpha = ctx.key_context_data().parms.special_modulus_size
        hybrid_step = (alpha > 1
                       and tuple(prev_cd.parms_id) == tuple(ctx.key_parms_id))
        if hybrid_step:
            from seal_tpu.ops import hybrid_keyswitch as hyb
            from seal_tpu.ops import ntt as ntt_mod2

            key_moduli = tuple(prev_cd.key_moduli())
            L = cd.coeff_modulus_size
            L_key = len(key_moduli)
            special_tables = ntt_mod2.slice_tables(
                prev_cd.ntt_tables, L_key - alpha, L_key)
            t_mod = (cd.parms.plain_modulus.value
                     if scheme != SchemeType.CKKS else 0)

            def body(data):
                polys = []
                for j in range(size):
                    polys.append(hyb.mod_down(
                        (data[0][j], data[1][j]), scheme == SchemeType.BGV,
                        key_moduli, alpha, L, t_mod, cd.ntt_tables,
                        special_tables, cd.mod_consts,
                        is_ntt_out=is_ntt_form, rows_ntt=is_ntt_form))
                return stack_polys(polys)
        else:
            rt = prev_cd.rns_tool_device
            tables = prev_cd.ntt_tables

            def body(data):
                polys = []
                for j in range(size):
                    p = (data[0][j], data[1][j])
                    if is_ntt_form:
                        p = rns_ops.divide_and_round_q_last_ntt(p, rt, tables)
                    elif scheme != SchemeType.BGV:
                        p = rns_ops.divide_and_round_q_last(p, rt)
                    else:
                        p = rns_ops.mod_t_and_divide_q_last(p, rt)
                    polys.append(p)
                return stack_polys(polys)

        fn = jax.jit(body)
        _ez_msd_cache[key] = fn
    return fn


class Encryptor:
    """Encrypt with a public key (asymmetric), a secret key (symmetric), or
    both (encryptor.h constructors: (ctx, pk), (ctx, sk), (ctx, pk, sk))."""

    def __init__(self, context: SEALContext, key, secret_key=None):
        self.context = context
        self.public_key: PublicKey | None = None
        self.secret_key: SecretKey | None = None
        self.set_key(key)
        if secret_key is not None:
            self.set_key(secret_key)

    def set_key(self, key):
        if isinstance(key, PublicKey):
            self.public_key = key
        elif isinstance(key, SecretKey):
            self.secret_key = key
        else:
            raise TypeError("key must be a PublicKey or SecretKey")

    set_public_key = set_key
    set_secret_key = set_key

    # -- zero encryption --------------------------------------------------------

    def encrypt_zero(self, parms_id=None, asymmetric: bool = True,
                     save_seed: bool = False) -> Ciphertext:
        ctx = self.context
        if parms_id is None:
            parms_id = ctx.first_parms_id
        cd = ctx.get_context_data(parms_id)
        scheme = cd.parms.scheme
        is_ntt_form = scheme == SchemeType.CKKS

        if asymmetric:
            if self.public_key is None:
                raise RuntimeError("public key is not set")
            prev_cd = cd.prev_context_data
            if prev_cd is not None:
                # encrypt at the level above, then switch the modulus down
                alpha = ctx.key_context_data().parms.special_modulus_size
                hybrid_step = (
                    alpha > 1
                    and tuple(prev_cd.parms_id) == tuple(ctx.key_parms_id))
                if not hybrid_step and scheme != SchemeType.BGV:
                    # native host path: encrypt-zero + ONE-prime rescale
                    # entirely in u64 C (the eager/jit route below costs
                    # ~0.3 s per CKKS encrypt at n=16384)
                    from seal_tpu.native import poly as native_poly

                    np_polys = rlwe.encrypt_zero_asymmetric_np(
                        self.public_key, ctx, prev_cd.parms_id, is_ntt_form)
                    if np_polys is not None:
                        npoly = native_poly.for_context_data(prev_cd)
                        outs = [
                            (npoly.rescale_ntt if is_ntt_form
                             else npoly.rescale_coeff)(
                                np.ascontiguousarray(np_polys[j]))
                            for j in range(np_polys.shape[0])
                        ]
                        return Ciphertext(
                            to_device(np.stack(outs)),
                            parms_id=tuple(parms_id),
                            is_ntt_form=is_ntt_form, scale=1.0,
                            correction_factor=1,
                        )
                temp = rlwe.encrypt_zero_asymmetric(
                    self.public_key, ctx, prev_cd.parms_id, is_ntt_form
                )
                fn = _ez_mod_switch_fn(
                    ctx, cd, prev_cd, scheme, is_ntt_form, temp.size)
                return Ciphertext(
                    fn(temp.data), parms_id=tuple(parms_id),
                    is_ntt_form=is_ntt_form, scale=temp.scale,
                    correction_factor=temp.correction_factor,
                )
            return rlwe.encrypt_zero_asymmetric(self.public_key, ctx, parms_id, is_ntt_form)
        else:
            if self.secret_key is None:
                raise RuntimeError("secret key is not set")
            return rlwe.encrypt_zero_symmetric(
                self.secret_key, ctx, parms_id, is_ntt_form, save_seed
            )

    # -- plaintext encryption ------------------------------------------------------

    def _encrypt_zero_np(self, cd, asymmetric: bool, save_seed: bool):
        """Fully-native encrypt-zero: (numpy [size, L, N], seed_info) or
        None when any leg of the path would need the JAX route."""
        from seal_tpu.native import poly as native_poly

        ctx = self.context
        scheme = cd.parms.scheme
        is_ntt_form = scheme == SchemeType.CKKS
        if asymmetric:
            if self.public_key is None:
                raise RuntimeError("public key is not set")
            prev_cd = cd.prev_context_data
            if prev_cd is None:
                polys = rlwe.encrypt_zero_asymmetric_np(
                    self.public_key, ctx, cd.parms_id, is_ntt_form)
                return None if polys is None else (polys, None)
            alpha = ctx.key_context_data().parms.special_modulus_size
            hybrid_step = (alpha > 1 and tuple(prev_cd.parms_id)
                           == tuple(ctx.key_parms_id))
            if hybrid_step or scheme == SchemeType.BGV:
                return None  # hybrid mod-down / BGV q-last stay on JAX
            np_polys = rlwe.encrypt_zero_asymmetric_np(
                self.public_key, ctx, prev_cd.parms_id, is_ntt_form)
            if np_polys is None:
                return None
            npoly = native_poly.for_context_data(prev_cd)
            outs = [(npoly.rescale_ntt if is_ntt_form
                     else npoly.rescale_coeff)(
                        np.ascontiguousarray(np_polys[j]))
                    for j in range(np_polys.shape[0])]
            return np.stack(outs), None
        if self.secret_key is None:
            raise RuntimeError("secret key is not set")
        r = rlwe.encrypt_zero_symmetric_parts_np(
            self.secret_key, ctx, cd.parms_id, is_ntt_form=is_ntt_form,
            save_seed=save_seed)
        if r is None:
            return None
        c0, c1, seed_info = r
        return np.stack([c0, c1]), (seed_info if save_seed else None)

    def _encrypt_np(self, plain: Plaintext, rows: np.ndarray, cd,
                    asymmetric: bool, save_seed: bool,
                    scale: float) -> Ciphertext | None:
        """One-executable native encrypt: encrypt-zero + the plaintext add
        on host u64 C, then a single to_device. rows: [L', N] u64 < q
        (L' <= L; shorter rows are added to the leading moduli only, the
        BFV/BGV full-width callers pass L' = L)."""
        from seal_tpu.native import poly as native_poly

        fast = self._encrypt_zero_np(cd, asymmetric, save_seed)
        if fast is None:
            return None
        polys, seed_info = fast
        npoly = native_poly.for_context_data(cd)
        if npoly is None:
            return None
        c0 = polys[0, :rows.shape[0]]
        npoly.add_inplace(np.ascontiguousarray(c0), rows)
        polys[0, :rows.shape[0]] = c0
        # LAZY device data (dtypes._LazyHostData): the host API never pays
        # the jax boundary; the first Evaluator touch materializes, and the
        # native decrypt path reads the host array directly
        from seal_tpu.dtypes import _LazyHostData

        ct = Ciphertext(
            _LazyHostData(polys), parms_id=tuple(cd.parms_id),
            is_ntt_form=cd.parms.scheme == SchemeType.CKKS, scale=scale,
            correction_factor=1,
        )
        if seed_info is not None:
            ct.seed_info = seed_info
        return ct

    def _encrypt_internal(self, plain: Plaintext, asymmetric: bool,
                          save_seed: bool = False) -> Ciphertext:
        ctx = self.context
        scheme = ctx.key_context_data().parms.scheme

        if scheme == SchemeType.BFV:
            if plain.is_ntt_form:
                raise ValueError("plain cannot be in NTT form")
            cd = ctx.first_context_data()
            scaled_np = _scaled_plain_rows(plain, cd)
            ct = self._encrypt_np(
                plain, scaled_np, cd, asymmetric, save_seed, 1.0)
            if ct is not None:
                return ct
            ct = self.encrypt_zero(ctx.first_parms_id, asymmetric, save_seed)
            scaled = to_device(scaled_np)
            c0 = modring.add_poly(ct.poly(0), scaled, cd.mod_consts)
            ct.data = (
                ct.data[0].at[0].set(c0[0]),
                ct.data[1].at[0].set(c0[1]),
            )
            return ct
        elif scheme == SchemeType.CKKS:
            if not plain.is_ntt_form or plain.rns_data is None:
                raise ValueError("plain must be in NTT form")
            cd = ctx.get_context_data(plain.parms_id)
            if cd is None:
                raise ValueError("plain is not valid for encryption parameters")
            host = plain.host_rns_u64()
            if host is not None:
                ct = self._encrypt_np(
                    plain, host, cd, asymmetric, save_seed, plain.scale)
                if ct is not None:
                    return ct
            ct = self.encrypt_zero(plain.parms_id, asymmetric, save_seed)
            c0 = modring.add_poly(ct.poly(0), plain.rns_data, cd.mod_consts)
            ct.data = (
                ct.data[0].at[0].set(c0[0]),
                ct.data[1].at[0].set(c0[1]),
            )
            ct.scale = plain.scale
            return ct
        elif scheme == SchemeType.BGV:
            if plain.is_ntt_form:
                raise ValueError("plain cannot be in NTT form")
            cd = ctx.first_context_data()
            moduli = cd.key_moduli()
            n = cd.parms.poly_modulus_degree
            rows = np.zeros((len(moduli), n), dtype=np.uint64)
            # plain coefficients are < t < every q_j: the lift is a copy
            rows[:, :len(plain.data)] = plain.data[None, :]
            ct = self._encrypt_np(
                plain, rows, cd, asymmetric, save_seed, 1.0)
            if ct is not None:
                return ct
            ct = self.encrypt_zero(ctx.first_parms_id, asymmetric, save_seed)
            c0 = modring.add_poly(ct.poly(0), to_device(rows), cd.mod_consts)
            ct.data = (
                ct.data[0].at[0].set(c0[0]),
                ct.data[1].at[0].set(c0[1]),
            )
            return ct
        raise ValueError("unsupported scheme")

    # -- batch-amortized encryption (TPU-native API; one native crossing
    #    per heavy kernel for the whole batch, bit-identical to sequential
    #    encrypt calls — tests/test_batch_api.py) -------------------------

    def _encrypt_zero_many_np(self, cd, B: int, asymmetric: bool,
                              save_seed: bool):
        """(c0s [B, L, N], c1s [B, L, N], seed_infos) or None when any leg
        would need the JAX route (callers fall back to sequential)."""
        from seal_tpu.native import poly as native_poly

        ctx = self.context
        scheme = cd.parms.scheme
        is_ntt_form = scheme == SchemeType.CKKS
        if asymmetric:
            if self.public_key is None:
                raise RuntimeError("public key is not set")
            prev_cd = cd.prev_context_data
            if prev_cd is None:
                polys = rlwe.encrypt_zero_asymmetric_many_np(
                    self.public_key, ctx, cd.parms_id, B, is_ntt_form)
                return (None if polys is None
                        else (polys[0], polys[1], [None] * B))
            alpha = ctx.key_context_data().parms.special_modulus_size
            hybrid_step = (alpha > 1 and tuple(prev_cd.parms_id)
                           == tuple(ctx.key_parms_id))
            if hybrid_step:
                return None
            polys = rlwe.encrypt_zero_asymmetric_many_np(
                self.public_key, ctx, prev_cd.parms_id, B, is_ntt_form)
            if polys is None:
                return None
            npoly = native_poly.for_context_data(prev_cd)
            if scheme == SchemeType.BGV:
                t = cd.parms.plain_modulus.value
                down = [npoly.bgv_modtq_many(p, int(t)) for p in polys]
                if any(d is None for d in down):
                    return None
                return down[0], down[1], [None] * B
            rescale = (npoly.rescale_ntt_many if is_ntt_form
                       else npoly.rescale_coeff_many)
            return rescale(polys[0]), rescale(polys[1]), [None] * B
        if self.secret_key is None:
            raise RuntimeError("secret key is not set")
        r = rlwe.encrypt_zero_symmetric_many_np(
            self.secret_key, ctx, cd.parms_id, B,
            is_ntt_form=is_ntt_form, save_seed=save_seed)
        if r is None:
            return None
        c0s, c1s, seed_infos = r
        return c0s, c1s, (seed_infos if save_seed
                          else [None] * B)

    def _encrypt_internal_many(self, plains, asymmetric: bool,
                               save_seed: bool = False) -> list[Ciphertext]:
        import ctypes

        from seal_tpu import native
        from seal_tpu.dtypes import _LazyHostData
        from seal_tpu.native import poly as native_poly

        ctx = self.context
        scheme = ctx.key_context_data().parms.scheme
        B = len(plains)
        if B == 0:
            return []
        lib = native.get_lib()
        seq = None  # set when the batch path is unavailable

        if scheme == SchemeType.BFV:
            cd = ctx.first_context_data()
            n = cd.parms.poly_modulus_degree
            moduli = cd.key_moduli()
            L = len(moduli)
            m_pad = np.zeros((B, n), dtype=np.uint64)
            for b, plain in enumerate(plains):   # validate BEFORE sampling
                if plain.is_ntt_form:
                    raise ValueError("plain cannot be in NTT form")
                d = plain.data
                m_pad[b, : min(len(d), n)] = d[:n]
            fast = (None if lib is None
                    or not hasattr(lib, "sealtpu_scaled_plain_add_many")
                    else self._encrypt_zero_many_np(
                        cd, B, asymmetric, save_seed))
            if fast is None:
                seq = plains
            else:
                c0s, c1s, seed_infos = fast
                q_arr = np.asarray([int(q) for q in moduli], dtype=np.uint64)
                d_arr = np.asarray(
                    [int(d) for d in cd.coeff_div_plain_modulus],
                    dtype=np.uint64)
                p = ctypes.POINTER(ctypes.c_uint64)
                lib.sealtpu_scaled_plain_add_many(
                    m_pad.ctypes.data_as(p), B, L, n,
                    q_arr.ctypes.data_as(p), d_arr.ctypes.data_as(p),
                    int(cd.coeff_modulus_mod_plain_modulus),
                    int(cd.plain_upper_half_threshold),
                    int(cd.parms.plain_modulus.value),
                    c0s.ctypes.data_as(p), L * n)
                scales = [1.0] * B
        elif scheme == SchemeType.CKKS:
            pid = plains[0].parms_id
            for plain in plains:
                if not plain.is_ntt_form or plain.rns_data is None:
                    raise ValueError("plain must be in NTT form")
                if tuple(plain.parms_id) != tuple(pid):
                    raise ValueError(
                        "encrypt_many requires one common level")
            cd = ctx.get_context_data(pid)
            if cd is None:
                raise ValueError(
                    "plain is not valid for encryption parameters")
            n = cd.parms.poly_modulus_degree
            L = cd.coeff_modulus_size
            hosts = [p.host_rns_u64() for p in plains]
            fast = (None if any(h is None or h.shape[0] != L
                                for h in hosts)
                    else self._encrypt_zero_many_np(
                        cd, B, asymmetric, save_seed))
            if fast is None:
                seq = plains
            else:
                c0s, c1s, seed_infos = fast
                npoly = native_poly.for_context_data(cd)
                rows = np.stack(hosts)
                npoly.add_inplace_many(c0s, np.ascontiguousarray(rows))
                scales = [p.scale for p in plains]
        elif scheme == SchemeType.BGV:
            cd = ctx.first_context_data()
            n = cd.parms.poly_modulus_degree
            moduli = cd.key_moduli()
            L = len(moduli)
            rows = np.zeros((B, L, n), dtype=np.uint64)
            for b, plain in enumerate(plains):   # validate BEFORE sampling
                if plain.is_ntt_form:
                    raise ValueError("plain cannot be in NTT form")
                d = plain.data
                # coefficients < t < every q_j: the lift is a copy
                rows[b, :, : min(len(d), n)] = d[None, :n]
            fast = self._encrypt_zero_many_np(cd, B, asymmetric, save_seed)
            if fast is None:
                seq = plains
            else:
                c0s, c1s, seed_infos = fast
                npoly = native_poly.for_context_data(cd)
                npoly.add_inplace_many(c0s, rows)
                scales = [1.0] * B
        else:
            raise ValueError("unsupported scheme")

        if seq is not None:
            return [self._encrypt_internal(p, asymmetric, save_seed)
                    for p in seq]
        polys = np.stack([c0s, c1s], axis=1)   # [B, 2, L, N] contiguous
        is_ntt = scheme == SchemeType.CKKS
        cts = []
        for b in range(B):
            ct = Ciphertext(
                _LazyHostData(polys[b]), parms_id=tuple(cd.parms_id),
                is_ntt_form=is_ntt, scale=scales[b], correction_factor=1,
            )
            if seed_infos[b] is not None:
                ct.seed_info = seed_infos[b]
            cts.append(ct)
        return cts

    def encrypt_many(self, plains) -> list[Ciphertext]:
        """Encrypt B plaintexts with ONE native crossing per heavy kernel
        (batch-amortized TPU-native API; encryptor.h has only scalar
        overloads). Bit-identical to [encrypt(p) for p in plains]."""
        return self._encrypt_internal_many(list(plains), asymmetric=True)

    def encrypt_symmetric_many(self, plains,
                               save_seed: bool = False) -> list[Ciphertext]:
        """Symmetric twin of encrypt_many."""
        return self._encrypt_internal_many(
            list(plains), asymmetric=False, save_seed=save_seed)

    def encrypt(self, plain: Plaintext) -> Ciphertext:
        return self._encrypt_internal(plain, asymmetric=True)

    def encrypt_symmetric(self, plain: Plaintext, save_seed: bool = False) -> Ciphertext:
        return self._encrypt_internal(plain, asymmetric=False, save_seed=save_seed)

    def encrypt_zero_symmetric(self, parms_id=None,
                               save_seed: bool = False) -> Ciphertext:
        """Reference-compat alias: encrypt_zero with the secret key
        (encryptor.h encrypt_zero_symmetric)."""
        return self.encrypt_zero(parms_id, asymmetric=False,
                                 save_seed=save_seed)
