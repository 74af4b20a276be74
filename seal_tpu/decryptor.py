"""Decryptor: BFV/CKKS/BGV decryption, noise budget, multiparty partial
decryption.

Parity: seal::Decryptor (/root/reference/native/src/seal/decryptor.cpp):
bfv_decrypt :225, ckks_decrypt :265, bgv_decrypt :300,
dot_product_ct_sk_array :407, invariant_noise_budget :491; fork's
distributed_decrypt :139 / aggregate_partial_decryption :89.
"""

from __future__ import annotations

import numpy as np

from seal_tpu.context import SEALContext
from seal_tpu.dtypes import Ciphertext, Plaintext, SecretKey, stack_polys, to_host, to_device
from seal_tpu.encryption_params import SchemeType, PARMS_ID_ZERO
from seal_tpu.ops import limb, modring, rns as rns_ops
from seal_tpu.ops import ntt as ntt_mod
from seal_tpu.utils import numth


# Cached-jit decrypt cores: the dot product + RNS tail otherwise dispatch
# thousands of eager u32 primitives per call (measured 0.5 s per BFV
# decrypt at n=4096, ~10 s at n=16384 — pure dispatch). One executable per
# (backend, ntt-form, ct size, scheme tail); jit re-traces per shape.
# Bit-identical: the same kernels run traced instead of dispatched.
_phase_jit_cache: dict = {}


def _phase_fn(is_ntt_form: bool, size: int, kind: str):
    import jax

    dd = jax.config.jax_default_device
    plat = (dd if isinstance(dd, str) else dd.platform) if dd is not None \
        else jax.default_backend()
    key = (plat, is_ntt_form, size, kind)
    fn = _phase_jit_cache.get(key)
    if fn is None:
        def body(data, powers, tables, mc, rtool):
            acc = None
            for j in range(1, size):
                cj = (data[0][j], data[1][j])
                if not is_ntt_form:
                    cj = ntt_mod.ntt_forward(cj, tables, lazy=True)
                term = modring.dyadic_product(cj, powers[j - 1], mc)
                acc = term if acc is None else modring.add_poly(acc, term, mc)
            if not is_ntt_form:
                acc = ntt_mod.ntt_inverse(acc, tables)
            phase = modring.add_poly(acc, (data[0][0], data[1][0]), mc)
            # the scheme tails return their PARTS; the final [1/2, N]
            # correction runs on host numpy — combining slices of the big
            # conversion chain in one XLA:CPU executable triggers a fusion
            # pathology (one u32 add measured 2-4 s at n=16384; the parts
            # separately cost 7 ms)
            if kind == "bfv":
                temp = limb.mul_mod_shoup(
                    phase, rtool.prod_t_gamma_mod_q_op,
                    rtool.prod_t_gamma_mod_q_qt, rtool.q_mc.q)
                tg = rns_ops.fast_convert_array(temp, rtool.conv_q_to_t_gamma)
                tg_mc = rtool.conv_q_to_t_gamma.obase_mc
                return limb.mul_mod_shoup(
                    tg, rtool.neg_inv_q_mod_t_gamma_op,
                    rtool.neg_inv_q_mod_t_gamma_qt, tg_mc.q)
            if kind == "bgv":
                return rns_ops.exact_convert_parts(phase, rtool.conv_q_to_t)
            return phase

        fn = jax.jit(body)
        _phase_jit_cache[key] = fn
    return fn


_agg_jit_cache: dict = {}


def _agg_tail_fn(kind: str):
    """Cached-jit scheme tail for aggregate_partial_decryption (input is
    the summed phase instead of a dot product; same PARTS-splitting as
    _phase_fn to dodge the XLA:CPU slice-fusion pathology)."""
    import jax

    dd = jax.config.jax_default_device
    plat = (dd if isinstance(dd, str) else dd.platform) if dd is not None \
        else jax.default_backend()
    key = (plat, kind)
    fn = _agg_jit_cache.get(key)
    if fn is None:
        def body(phase, rtool):
            if kind == "bfv":
                temp = limb.mul_mod_shoup(
                    phase, rtool.prod_t_gamma_mod_q_op,
                    rtool.prod_t_gamma_mod_q_qt, rtool.q_mc.q)
                tg = rns_ops.fast_convert_array(temp, rtool.conv_q_to_t_gamma)
                tg_mc = rtool.conv_q_to_t_gamma.obase_mc
                return limb.mul_mod_shoup(
                    tg, rtool.neg_inv_q_mod_t_gamma_op,
                    rtool.neg_inv_q_mod_t_gamma_qt, tg_mc.q)
            return rns_ops.exact_convert_parts(phase, rtool.conv_q_to_t)

        fn = jax.jit(body)
        _agg_jit_cache[key] = fn
    return fn


def _bfv_round_host(tg: np.ndarray, host) -> np.ndarray:
    """The {t, γ} correction tail of BFV decryption on host numpy u64
    (rns.cpp:1170-1201 parity; value-identical to
    rns_ops.decrypt_scale_and_round's tail)."""
    t = host.t
    gamma = host.gamma
    t_row, g_row = tg[0], tg[1]
    over = g_row > np.uint64(gamma >> 1)
    corr_pos = (t_row + (np.uint64(gamma) - g_row) % np.uint64(t)) \
        % np.uint64(t)
    corr_neg = (t_row + np.uint64(t) - g_row % np.uint64(t)) % np.uint64(t)
    dest = np.where(over, corr_pos, corr_neg)
    inv = host.inv_gamma_mod_t
    if t < (1 << 32):
        return dest * np.uint64(inv) % np.uint64(t)
    # large t: exact per-element Python ints (t <= 60 bits)
    return np.asarray([(int(v) * inv) % t for v in dest], dtype=np.uint64)


class Decryptor:
    def __init__(self, context: SEALContext, secret_key: SecretKey):
        self.context = context
        self.secret_key = secret_key
        # powers of s over the KEY tower, NTT form; built on first device
        # use so a lazily-sampled secret key stays host-side through the
        # native decrypt path (_powers_np)
        self._sk_powers: list | None = None

    def _phase_core(self, ct: Ciphertext, kind: str):
        """One-executable dot_product (+ scheme tail) for eager callers."""
        cd = self.context.get_context_data(ct.parms_id)
        powers = tuple(self._powers(ct.size - 1, cd))
        return _phase_fn(ct.is_ntt_form, ct.size, kind)(
            ct.data, powers, cd.ntt_tables, cd.mod_consts,
            cd.rns_tool_device)

    def _powers_np(self, count: int, cd):
        """Host u64 mirrors of the secret-key powers (native decrypt)."""
        from seal_tpu import rlwe
        from seal_tpu.native import poly as native_poly

        key_cd = self.context.key_context_data()
        npk = native_poly.for_context_data(key_cd)
        powers = getattr(self, "_sk_powers_np", None)
        if powers is None:
            powers = [rlwe.sk_host_u64(self.secret_key)]
        while len(powers) < count:
            powers.append(npk.dyadic_mul(
                np.ascontiguousarray(powers[-1]),
                np.ascontiguousarray(powers[0])))
        self._sk_powers_np = powers
        L = cd.coeff_modulus_size
        return [np.ascontiguousarray(p[:L]) for p in powers[:count]]

    def _phase_np(self, ct: Ciphertext, cd):
        """Native u64 decrypt phase c0 + Σ c_j s^j, numpy [L, N]; None when
        the native library is unavailable."""
        from seal_tpu.native import poly as native_poly

        npoly = native_poly.for_context_data(cd)
        if npoly is None:
            return None
        data = ct.host_u64()
        if data is None:
            data = to_host(ct.data)
        powers = self._powers_np(ct.size - 1, cd)
        if ct.size == 2:
            # fused one-call path for the common size-2 ciphertext
            return npoly.phase2(
                np.ascontiguousarray(data[0]), np.ascontiguousarray(data[1]),
                powers[0], ct.is_ntt_form)
        acc = None
        for j in range(1, ct.size):
            # copy: ntt_forward mutates in place, and `data` may be the
            # ciphertext's cached host mirror (host_np)
            cj = np.array(data[j]) if not ct.is_ntt_form \
                else np.ascontiguousarray(data[j])
            if not ct.is_ntt_form:
                npoly.ntt_forward(cj, lazy=True)
            term = npoly.dyadic_mul(cj, powers[j - 1])
            acc = term if acc is None else npoly.add_inplace(acc, term)
        if not ct.is_ntt_form:
            npoly.ntt_inverse(acc)
        return npoly.add_inplace(acc, np.ascontiguousarray(data[0]))

    def _powers(self, count: int, cd):
        key_cd = self.context.key_context_data()
        mc = key_cd.mod_consts
        powers = [self.secret_key.data] if self._sk_powers is None \
            else list(self._sk_powers)
        while len(powers) < count:
            powers.append(
                modring.dyadic_product(powers[-1], powers[0], mc)
            )
        # cache only concrete arrays — a power first computed inside a jit
        # trace is a tracer and must not escape the trace scope
        import jax.core

        if not isinstance(powers[-1][0], jax.core.Tracer):
            self._sk_powers = powers
        L = cd.coeff_modulus_size
        return [(p[0][:L], p[1][:L]) for p in powers[:count]]

    def dot_product_ct_sk(self, ct: Ciphertext):
        """c0 + c1·s + c2·s² + ... over the ct's tower; same domain as ct
        (parity: decryptor.cpp:407-489)."""
        cd = self.context.get_context_data(ct.parms_id)
        mc = cd.mod_consts
        tables = cd.ntt_tables
        powers = self._powers(ct.size - 1, cd)
        acc = None
        for j in range(1, ct.size):
            cj = ct.poly(j)
            if not ct.is_ntt_form:
                cj = ntt_mod.ntt_forward(cj, tables, lazy=True)
            term = modring.dyadic_product(cj, powers[j - 1], mc)
            acc = term if acc is None else modring.add_poly(acc, term, mc)
        if not ct.is_ntt_form:
            acc = ntt_mod.ntt_inverse(acc, tables)
        return modring.add_poly(acc, ct.poly(0), mc)

    def _smudging_rows(self, cd, bits: int):
        """Freshly sampled uniform noise e ∈ [-2^bits, 2^bits] lifted to the
        level's RNS rows (coefficient domain). Shared by the multiparty
        partial decryption and CKKS noise-flooding decrypt."""
        from seal_tpu import randomgen

        rng = randomgen.UniformRandomGeneratorFactory().create()
        moduli = cd.key_moduli()
        n = cd.parms.poly_modulus_degree
        nbytes = (bits + 7) // 8 + 1
        raw = np.frombuffer(rng.generate(n * nbytes), dtype=np.uint8)
        e = np.zeros(n, dtype=object)
        for i in range(n):
            chunk = int.from_bytes(
                raw[i * nbytes:(i + 1) * nbytes].tobytes(), "little")
            e[i] = (chunk % (1 << (bits + 1))) - (1 << bits)
        rows = np.stack([
            np.asarray([int(x) % q for x in e], dtype=np.uint64) for q in moduli
        ])
        return to_device(rows)

    # -- scheme decrypt -----------------------------------------------------------

    def decrypt(self, ct: Ciphertext, flood_bits: int = 0) -> Plaintext:
        """Decrypt. `flood_bits` > 0 (CKKS only) adds fresh uniform noise of
        that magnitude to the decryption — the Li-Micciancio noise-flooding
        countermeasure (Eurocrypt 2021, "On the Security of Homomorphic
        Encryption on Approximate Numbers"): a CKKS decryption shared with
        any party who did not encrypt the inputs leaks the secret key
        through the exact LWE noise unless it is flooded. The reference has
        no equivalent (decryptor.cpp:265 returns the raw phase); choose
        flood_bits ≈ statistical-security bits + log2(noise estimate)."""
        if ct.size < 2:
            raise ValueError("encrypted is empty")
        scheme = self.context.key_context_data().parms.scheme
        if flood_bits and scheme != SchemeType.CKKS:
            raise ValueError(
                "flood_bits is a CKKS-only countermeasure (exact-scheme "
                "decryptions do not expose the noise)")
        if scheme == SchemeType.BFV:
            return self._bfv_decrypt(ct)
        if scheme == SchemeType.CKKS:
            return self._ckks_decrypt(ct, flood_bits)
        if scheme == SchemeType.BGV:
            return self._bgv_decrypt(ct)
        raise ValueError("unsupported scheme")

    def _bfv_decrypt(self, ct: Ciphertext) -> Plaintext:
        if ct.is_ntt_form:
            raise ValueError("encrypted cannot be in NTT form")
        from seal_tpu.native import poly as native_poly

        cd = self.context.get_context_data(ct.parms_id)
        ndt = native_poly.decrypt_tool_for(cd)
        if ndt is not None:
            if ct.size == 2:
                # whole decrypt in ONE native call (phase + {t,γ} tail)
                data = ct.host_u64()
                if data is None:
                    data = to_host(ct.data)
                npoly = native_poly.for_context_data(cd)
                out = ndt.bfv_decrypt2(
                    npoly, np.ascontiguousarray(data[0]),
                    np.ascontiguousarray(data[1]),
                    self._powers_np(1, cd)[0])
                return _trimmed_plain(out)
            phase = self._phase_np(ct, cd)
            return _trimmed_plain(ndt.bfv_scale_round(phase))
        tg = to_host(self._phase_core(ct, "bfv"))        # [2, N]
        return _trimmed_plain(_bfv_round_host(tg, cd.rns_tool_host))

    def _ckks_decrypt(self, ct: Ciphertext, flood_bits: int = 0) -> Plaintext:
        if not ct.is_ntt_form:
            raise ValueError("encrypted must be in NTT form")
        cd0 = self.context.get_context_data(ct.parms_id)
        phase_np = self._phase_np(ct, cd0)
        if phase_np is not None and flood_bits == 0:
            # lazy device plaintext: decode reads the host rows directly
            from seal_tpu.dtypes import _LazyHostData

            p = Plaintext()
            p.rns_data = _LazyHostData(phase_np)
            p.parms_id = tuple(ct.parms_id)
            p.scale = ct.scale
            return p
        phase = (to_device(phase_np) if phase_np is not None
                 else self._phase_core(ct, "phase"))
        if flood_bits > 0:
            cd = self.context.get_context_data(ct.parms_id)
            noise = ntt_mod.ntt_forward(
                self._smudging_rows(cd, flood_bits), cd.ntt_tables)
            phase = modring.add_poly(phase, noise, cd.mod_consts)
        p = Plaintext()
        p.rns_data = phase
        p.parms_id = tuple(ct.parms_id)
        p.scale = ct.scale
        return p

    def _bgv_decrypt(self, ct: Ciphertext) -> Plaintext:
        if ct.is_ntt_form:
            raise ValueError("encrypted cannot be in NTT form")
        from seal_tpu.native import poly as native_poly

        cd = self.context.get_context_data(ct.parms_id)
        t = cd.parms.plain_modulus.value
        ndt = native_poly.decrypt_tool_for(cd)
        if ndt is not None:
            phase = self._phase_np(ct, cd)
            many = ndt.bgv_modt_many(phase[None])
            vals = many[0] if many is not None else ndt.bgv_modt(phase)
        else:
            dot, v_q = self._phase_core(ct, "bgv")
            d, vq = to_host(dot)[0], to_host(v_q)[0]
            vals = np.where(d >= vq, d - vq, d + np.uint64(t) - vq)
        if ct.correction_factor != 1:
            fix = numth.invert_uint_mod(ct.correction_factor, t)
            vals = (vals.astype(object) * fix % t).astype(np.uint64)
        return _trimmed_plain(vals)

    # -- batch-amortized decryption (TPU-native API) -------------------------------

    def decrypt_many(self, cts) -> list[Plaintext]:
        """Decrypt B ciphertexts with ONE native crossing for the whole
        batch (batch-amortized TPU-native API; decryptor.h has only the
        scalar overload). Bit-identical to [decrypt(ct) for ct in cts].
        Requires all ciphertexts at one level, size 2 (the common case);
        anything else falls back to sequential decrypt calls."""
        from seal_tpu.native import poly as native_poly

        cts = list(cts)
        if not cts:
            return []
        scheme = self.context.key_context_data().parms.scheme
        pid = tuple(cts[0].parms_id)
        uniform = all(
            ct.size == 2 and tuple(ct.parms_id) == pid for ct in cts)
        cd = self.context.get_context_data(pid) if uniform else None
        npoly = (native_poly.for_context_data(cd)
                 if cd is not None else None)
        if (not uniform or npoly is None
                or not hasattr(npoly.lib, "sealtpu_phase2_many")):
            return [self.decrypt(ct) for ct in cts]
        B = len(cts)
        L = cd.coeff_modulus_size
        n = cd.parms.poly_modulus_degree
        stack = np.empty((B, 2, L, n), dtype=np.uint64)
        for b, ct in enumerate(cts):
            data = ct.host_u64()
            if data is None:
                data = to_host(ct.data)
            stack[b] = data[:2, :L]
        sk = self._powers_np(1, cd)[0]

        if scheme == SchemeType.BFV:
            for ct in cts:
                if ct.is_ntt_form:
                    raise ValueError("encrypted cannot be in NTT form")
            ndt = native_poly.decrypt_tool_for(cd)
            if ndt is None:
                return [self.decrypt(ct) for ct in cts]
            outs = ndt.bfv_decrypt_many(npoly, stack, sk)
            return [_trimmed_plain(outs[b]) for b in range(B)]
        if scheme == SchemeType.CKKS:
            from seal_tpu.dtypes import _LazyHostData

            for ct in cts:
                if not ct.is_ntt_form:
                    raise ValueError("encrypted must be in NTT form")
            phases = npoly.phase2_many(stack, sk, True)
            plains = []
            for b, ct in enumerate(cts):
                p = Plaintext()
                p.rns_data = _LazyHostData(phases[b])
                p.parms_id = pid
                p.scale = ct.scale
                plains.append(p)
            return plains
        if scheme == SchemeType.BGV:
            for ct in cts:
                if ct.is_ntt_form:
                    raise ValueError("encrypted cannot be in NTT form")
            ndt = native_poly.decrypt_tool_for(cd)
            if ndt is None:
                return [self.decrypt(ct) for ct in cts]
            t = cd.parms.plain_modulus.value
            phases = npoly.phase2_many(stack, sk, False)
            vals_all = ndt.bgv_modt_many(phases)
            plains = []
            for b, ct in enumerate(cts):
                vals = (vals_all[b] if vals_all is not None
                        else ndt.bgv_modt(phases[b]))
                if ct.correction_factor != 1:
                    fix = numth.invert_uint_mod(ct.correction_factor, t)
                    vals = (vals.astype(object) * fix % t).astype(np.uint64)
                plains.append(_trimmed_plain(vals))
            return plains
        return [self.decrypt(ct) for ct in cts]

    # -- noise meter ---------------------------------------------------------------

    def invariant_noise_budget(self, ct: Ciphertext) -> int:
        """Bits of noise headroom left (parity: decryptor.cpp:491-560)."""
        scheme = self.context.key_context_data().parms.scheme
        if scheme not in (SchemeType.BFV, SchemeType.BGV):
            raise ValueError("unsupported scheme")
        if ct.is_ntt_form:
            raise ValueError("encrypted cannot be in NTT form")
        cd = self.context.get_context_data(ct.parms_id)
        t = cd.parms.plain_modulus.value
        phase = to_host(self._phase_core(ct, "phase"))  # [L, N]
        Q = cd.total_coeff_modulus
        base = cd.rns_base
        norm = 0
        half_q = Q >> 1
        for k in range(phase.shape[1]):
            v = base.compose([int(x) for x in phase[:, k]])
            if scheme == SchemeType.BFV:
                v = (v * t) % Q
            if v > half_q:
                v = Q - v
            norm = max(norm, v)
        diff = cd.total_coeff_modulus_bit_count - norm.bit_length() - 1
        return max(0, diff)

    # -- fork multiparty surface ------------------------------------------------------

    def distributed_decrypt(self, ct: Ciphertext, smudging_bits: int = 0) -> Ciphertext:
        """Party-local partial decryption c1·s_i (+ smudging noise), returned
        as a ciphertext shell (parity: decryptor.cpp:139-187; the reference
        adds NO smudging noise — documented gap, fixed here via
        `smudging_bits` > 0)."""
        if ct.size != 2:
            raise ValueError("distributed decryption requires size-2 ciphertexts")
        cd = self.context.get_context_data(ct.parms_id)
        mc = cd.mod_consts
        tables = cd.ntt_tables
        c1 = ct.poly(1)
        if not ct.is_ntt_form:
            c1 = ntt_mod.ntt_forward(c1, tables, lazy=True)
        sk = self._powers(1, cd)[0]
        part = modring.dyadic_product(c1, sk, mc)
        if not ct.is_ntt_form:
            part = ntt_mod.ntt_inverse(part, tables)
        if smudging_bits > 0:
            noise = self._smudging_rows(cd, smudging_bits)
            if ct.is_ntt_form:
                noise = ntt_mod.ntt_forward(noise, tables)
            part = modring.add_poly(part, noise, mc)
        shell = Ciphertext(
            stack_polys([part, part]), parms_id=tuple(ct.parms_id),
            is_ntt_form=ct.is_ntt_form, scale=ct.scale,
            correction_factor=ct.correction_factor,
        )
        return shell

    def aggregate_partial_decryption(self, ct: Ciphertext, partials: list[Ciphertext]) -> Plaintext:
        """c0 + Σ partials -> plaintext (parity: decryptor.cpp:89-137);
        works for any number of parties (the reference hard-codes 3)."""
        cd = self.context.get_context_data(ct.parms_id)
        mc = cd.mod_consts
        scheme = self.context.key_context_data().parms.scheme
        acc = ct.poly(0)
        for p in partials:
            acc = modring.add_poly(acc, p.poly(0), mc)
        if scheme == SchemeType.BFV:
            tg = to_host(_agg_tail_fn("bfv")(acc, cd.rns_tool_device))
            return _trimmed_plain(_bfv_round_host(tg, cd.rns_tool_host))
        if scheme == SchemeType.BGV:
            t_mod = cd.parms.plain_modulus.value
            dot, v_q = _agg_tail_fn("bgv")(acc, cd.rns_tool_device)
            d, vq = to_host(dot)[0], to_host(v_q)[0]
            vals = np.where(d >= vq, d - vq, d + np.uint64(t_mod) - vq)
            # same correction-factor inverse as _bgv_decrypt: threshold
            # decryption of a mod-switched/multiplied BGV ciphertext must
            # undo the tracked multiplicative factor (evaluator.cpp:56-118)
            if ct.correction_factor != 1:
                t = cd.parms.plain_modulus.value
                fix = numth.invert_uint_mod(ct.correction_factor, t)
                vals = (vals.astype(object) * fix % t).astype(np.uint64)
            return _trimmed_plain(vals)
        p = Plaintext()
        p.rns_data = acc
        p.parms_id = tuple(ct.parms_id)
        p.scale = ct.scale
        return p


def _trimmed_plain(vals: np.ndarray) -> Plaintext:
    # last-nonzero via reversed argmax: no index-array allocation
    # (np.nonzero built a full index vector — ~6 us/ct at n=1024, more
    # than the decrypt tail after the r5 batch kernels)
    nz = vals != 0
    count = (len(vals) - int(np.argmax(nz[::-1]))) if nz.any() else 1
    p = Plaintext()
    # copy: a view would alias (and pin) the whole shared batch buffer
    p.data = vals[:count].copy()
    return p
