"""Evaluator: the homomorphic operation set over device-resident ciphertexts.

Parity: seal::Evaluator (/root/reference/native/src/seal/evaluator.cpp):
negate/add/sub :124-350, BFV BEHZ multiply :395-567, CKKS multiply :569-708,
BGV multiply :710-794, relinearize :1104-1159, mod switch :1161-1340,
rescale :1441-1479, multiply_many :1535, exponentiate :1612, plain ops
:1692-2031, NTT transforms :2033-2220, apply_galois :2221-2323, rotations
:2325-2380, switch_key :2382-2677, BGV correction-factor balancing :56-118.

TPU design: ops are pure functions over ciphertext pytrees; the key-switch
inner product is a batched 128-bit-lazy accumulation over the decomposition
axis, with all (L+1) extended-modulus rows transformed in a single batched
NTT.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from seal_tpu.context import ContextData, SEALContext
from seal_tpu.dtypes import (
    Ciphertext,
    GaloisKeys,
    KSwitchKeys,
    Plaintext,
    RelinKeys,
    stack_polys,
    to_device,
    to_host,
    zeros_pair,
)
from seal_tpu.encryption_params import SchemeType
from seal_tpu.modulus import CIPHERTEXT_SIZE_MAX
from seal_tpu.ops import limb, modring
from seal_tpu.ops import ntt as ntt_mod
from seal_tpu.ops import rns as rns_ops
from seal_tpu.utils import numth


class Evaluator:
    def __init__(self, context: SEALContext):
        if not context.parameters_set:
            raise ValueError("encryption parameters are not set correctly")
        self.context = context

    # -- helpers ---------------------------------------------------------------

    def _cd(self, ct: Ciphertext) -> ContextData:
        cd = self.context.get_context_data(ct.parms_id)
        if cd is None:
            raise ValueError("ciphertext is not valid for encryption parameters")
        return cd

    def _scheme(self) -> SchemeType:
        return self.context.key_context_data().parms.scheme

    def _check_same(self, a: Ciphertext, b: Ciphertext):
        if a.parms_id != b.parms_id:
            raise ValueError("encrypted parameters mismatch")
        if a.is_ntt_form != b.is_ntt_form:
            raise ValueError("NTT form mismatch")

    def _balance_correction_factors(self, a: Ciphertext, b: Ciphertext, cd):
        """BGV: bring two ciphertexts to a common correction factor with the
        smallest balanced multipliers, via extended Euclid on f2/f1 mod t
        (parity: evaluator.cpp:56-118). Returns (f0, e1, e2): scale a by e1,
        b by e2, result factor f0."""
        t = cd.parms.plain_modulus.value
        f1, f2 = a.correction_factor, b.correction_factor
        half_t = t // 2

        def sum_abs(x, y):
            xb = x - t if x > half_t else x
            yb = y - t if y > half_t else y
            return abs(xb) + abs(yb)

        ratio = (numth.invert_uint_mod(f1, t) * f2) % t
        e1, e2 = ratio, 1
        best = sum_abs(e1, e2)
        prev_a, aa = t, ratio
        prev_b, bb = 0, 1
        while aa != 0:
            q = prev_a // aa
            prev_a, aa = aa, prev_a - q * aa
            prev_b, bb = bb, prev_b - bb * q
            a_mod = abs(aa) % t
            if aa < 0:
                a_mod = (t - a_mod) % t
            b_mod = abs(bb) % t
            if bb < 0:
                b_mod = (t - b_mod) % t
            if a_mod != 0 and numth.gcd(a_mod, t) == 1:
                s = sum_abs(a_mod, b_mod)
                if s < best:
                    best = s
                    e1, e2 = a_mod, b_mod
        return (e1 * f1) % t, e1, e2

    def _scale_poly_host_scalar(self, ct_pair, scalar: int, cd):
        """Multiply all polys of a ct tensor by an integer scalar mod q."""
        moduli = cd.key_moduli()
        L = len(moduli)
        op, qt = modring.shoup_pair(
            [[scalar % q] for q in moduli], [[q] for q in moduli], shape=(L, 1)
        )
        return limb.mul_mod_shoup(ct_pair, op, qt, cd.mod_consts.q)

    # -- negate / add / sub ------------------------------------------------------

    def negate(self, ct: Ciphertext) -> Ciphertext:
        cd = self._cd(ct)
        out = ct.copy()
        out.data = modring.negate_poly(ct.data, cd.mod_consts)
        return out

    def add(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        self._check_same(a, b)
        cd = self._cd(a)
        scheme = cd.parms.scheme
        f0, fa, fb = a.correction_factor, 1, 1
        if scheme == SchemeType.BGV and a.correction_factor != b.correction_factor:
            f0, fa, fb = self._balance_correction_factors(a, b, cd)
        da, db = a.data, b.data
        if fa != 1:
            da = self._scale_poly_host_scalar(da, fa, cd)
        if fb != 1:
            db = self._scale_poly_host_scalar(db, fb, cd)
        if scheme == SchemeType.CKKS and not _scales_close(a.scale, b.scale):
            raise ValueError("scale mismatch")
        size = max(a.size, b.size)
        min_size = min(a.size, b.size)
        mc = cd.mod_consts
        lo = []
        hi = []
        for j in range(size):
            if j < min_size:
                s = modring.add_poly(
                    (da[0][j], da[1][j]), (db[0][j], db[1][j]), mc
                )
            elif j < a.size:
                s = (da[0][j], da[1][j])
            else:
                s = (db[0][j], db[1][j])
            lo.append(s[0])
            hi.append(s[1])
        out = a.copy()
        out.data = (jnp.stack(lo), jnp.stack(hi))
        out.correction_factor = f0
        return out

    def add_many(self, cts: list[Ciphertext]) -> Ciphertext:
        """Sum of ciphertexts (evaluator.h add_many; linear fold as the
        reference does — sizes may differ, add() resizes)."""
        if not cts:
            raise ValueError("cts cannot be empty")
        out = cts[0]
        for ct in cts[1:]:
            out = self.add(out, ct)
        return out

    def sub(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        self._check_same(a, b)
        cd = self._cd(a)
        scheme = cd.parms.scheme
        f0, fa, fb = a.correction_factor, 1, 1
        if scheme == SchemeType.BGV and a.correction_factor != b.correction_factor:
            f0, fa, fb = self._balance_correction_factors(a, b, cd)
        da, db = a.data, b.data
        if fa != 1:
            da = self._scale_poly_host_scalar(da, fa, cd)
        if fb != 1:
            db = self._scale_poly_host_scalar(db, fb, cd)
        if scheme == SchemeType.CKKS and not _scales_close(a.scale, b.scale):
            raise ValueError("scale mismatch")
        size = max(a.size, b.size)
        min_size = min(a.size, b.size)
        mc = cd.mod_consts
        lo, hi = [], []
        for j in range(size):
            if j < min_size:
                s = modring.sub_poly((da[0][j], da[1][j]), (db[0][j], db[1][j]), mc)
            elif j < a.size:
                s = (da[0][j], da[1][j])
            else:
                s = modring.negate_poly((db[0][j], db[1][j]), mc)
            lo.append(s[0])
            hi.append(s[1])
        out = a.copy()
        out.data = (jnp.stack(lo), jnp.stack(hi))
        out.correction_factor = f0
        return out

    # -- multiplication -------------------------------------------------------------

    def multiply(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        self._check_same(a, b)
        scheme = self._scheme()
        if scheme == SchemeType.BFV:
            return self._bfv_multiply(a, b)
        if scheme == SchemeType.CKKS:
            return self._ckks_multiply(a, b)
        if scheme == SchemeType.BGV:
            return self._bgv_multiply(a, b)
        raise ValueError("unsupported scheme")

    def square(self, a: Ciphertext) -> Ciphertext:
        """Specialized squaring (evaluator.cpp:831-1103): for size-2 inputs
        the dyadic convolution needs 3 products instead of 4, and BFV
        base-extends one ciphertext instead of two. Larger sizes fall back
        to multiply, as the reference does."""
        if a.size != 2:
            return self.multiply(a, a)
        scheme = self._scheme()
        if scheme == SchemeType.BFV:
            return self._bfv_square(a)
        if scheme == SchemeType.CKKS:
            return self._ckks_square(a)
        if scheme == SchemeType.BGV:
            return self._bgv_square(a)
        raise ValueError("unsupported scheme")

    def _square_dyadic(self, polys, mc):
        """(c0, c1) NTT-form -> (c0², 2·c0·c1, c1²)."""
        p00 = modring.dyadic_product(polys[0], polys[0], mc)
        p01 = modring.dyadic_product(polys[0], polys[1], mc)
        p11 = modring.dyadic_product(polys[1], polys[1], mc)
        return [p00, modring.add_poly(p01, p01, mc), p11]

    def _bfv_square(self, a: Ciphertext) -> Ciphertext:
        if a.is_ntt_form:
            raise ValueError("BFV square input cannot be in NTT form")
        cd = self._cd(a)
        rt = cd.rns_tool_device
        tables = cd.ntt_tables
        bsk_tables = rt.bsk_ntt
        mc = cd.mod_consts
        bsk_mc = rt.bsk_mc
        t = cd.parms.plain_modulus.value

        qs, bsks = [], []
        for j in range(a.size):
            p = a.poly(j)
            qs.append(ntt_mod.ntt_forward(p, tables))
            bskm = rns_ops.fastbconv_m_tilde(p, rt)
            bsk = rns_ops.sm_mrq(bskm, rt)
            bsks.append(ntt_mod.ntt_forward(bsk, bsk_tables))

        out_q = self._square_dyadic(qs, mc)
        out_bsk = self._square_dyadic(bsks, bsk_mc)

        moduli = cd.key_moduli()
        bsk_moduli = cd.rns_tool_host.base_Bsk.base
        t_op_q, t_qt_q = modring.shoup_pair(
            [[t % q] for q in moduli], [[q] for q in moduli], shape=(len(moduli), 1))
        t_op_b, t_qt_b = modring.shoup_pair(
            [[t % q] for q in bsk_moduli], [[q] for q in bsk_moduli],
            shape=(len(bsk_moduli), 1))
        polys = []
        for k in range(3):
            cq = ntt_mod.ntt_inverse(out_q[k], tables)
            cb = ntt_mod.ntt_inverse(out_bsk[k], bsk_tables)
            cq = limb.mul_mod_shoup(cq, t_op_q, t_qt_q, mc.q)
            cb = limb.mul_mod_shoup(cb, t_op_b, t_qt_b, bsk_mc.q)
            joined = (
                jnp.concatenate([cq[0], cb[0]], axis=-2),
                jnp.concatenate([cq[1], cb[1]], axis=-2),
            )
            floored = rns_ops.fast_floor(joined, rt)
            polys.append(rns_ops.fastbconv_sk(floored, rt))

        out = a.copy()
        out.data = stack_polys(polys)
        return out

    def _ckks_square(self, a: Ciphertext) -> Ciphertext:
        if not a.is_ntt_form:
            raise ValueError("CKKS square input must be in NTT form")
        cd = self._cd(a)
        res = a.copy()
        res.data = stack_polys(self._square_dyadic([a.poly(0), a.poly(1)], cd.mod_consts))
        res.scale = a.scale * a.scale
        _check_scale(res.scale, cd)
        return res

    def _bgv_square(self, a: Ciphertext) -> Ciphertext:
        if a.is_ntt_form:
            raise ValueError("BGV square input cannot be in NTT form")
        cd = self._cd(a)
        mc = cd.mod_consts
        tables = cd.ntt_tables
        a_ntt = [ntt_mod.ntt_forward(a.poly(j), tables) for j in range(2)]
        out = self._square_dyadic(a_ntt, mc)
        polys = [ntt_mod.ntt_inverse(p, tables) for p in out]
        res = a.copy()
        res.data = stack_polys(polys)
        t = cd.parms.plain_modulus.value
        res.correction_factor = (a.correction_factor * a.correction_factor) % t
        return res

    def _bfv_multiply(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        """BEHZ 8-step RNS multiplication (evaluator.cpp:395-567)."""
        if a.is_ntt_form or b.is_ntt_form:
            raise ValueError("BFV multiply inputs cannot be in NTT form")
        cd = self._cd(a)
        rt = cd.rns_tool_device
        tables = cd.ntt_tables
        bsk_tables = rt.bsk_ntt
        mc = cd.mod_consts
        bsk_mc = rt.bsk_mc
        t = cd.parms.plain_modulus.value
        dest_size = a.size + b.size - 1

        def extend(ct):
            """steps (1)-(3): per input poly, (q NTT form, Bsk NTT form)."""
            qs, bsks = [], []
            for j in range(ct.size):
                p = ct.poly(j)
                qs.append(ntt_mod.ntt_forward(p, tables))
                bskm = rns_ops.fastbconv_m_tilde(p, rt)
                bsk = rns_ops.sm_mrq(bskm, rt)
                bsks.append(ntt_mod.ntt_forward(bsk, bsk_tables))
            return qs, bsks

        a_q, a_bsk = extend(a)
        b_q, b_bsk = extend(b)

        # step (4): dyadic convolution in both bases
        out_q = [None] * dest_size
        out_bsk = [None] * dest_size
        for i in range(a.size):
            for j in range(b.size):
                k = i + j
                pq = modring.dyadic_product(a_q[i], b_q[j], mc)
                pb = modring.dyadic_product(a_bsk[i], b_bsk[j], bsk_mc)
                out_q[k] = pq if out_q[k] is None else modring.add_poly(out_q[k], pq, mc)
                out_bsk[k] = pb if out_bsk[k] is None else modring.add_poly(out_bsk[k], pb, bsk_mc)

        # steps (5)-(8)
        moduli = cd.key_moduli()
        bsk_moduli = cd.rns_tool_host.base_Bsk.base
        t_op_q, t_qt_q = modring.shoup_pair(
            [[t % q] for q in moduli], [[q] for q in moduli], shape=(len(moduli), 1))
        t_op_b, t_qt_b = modring.shoup_pair(
            [[t % q] for q in bsk_moduli], [[q] for q in bsk_moduli], shape=(len(bsk_moduli), 1))
        polys = []
        for k in range(dest_size):
            cq = ntt_mod.ntt_inverse(out_q[k], tables)
            cb = ntt_mod.ntt_inverse(out_bsk[k], bsk_tables)
            cq = limb.mul_mod_shoup(cq, t_op_q, t_qt_q, mc.q)
            cb = limb.mul_mod_shoup(cb, t_op_b, t_qt_b, bsk_mc.q)
            joined = (
                jnp.concatenate([cq[0], cb[0]], axis=-2),
                jnp.concatenate([cq[1], cb[1]], axis=-2),
            )
            floored = rns_ops.fast_floor(joined, rt)
            polys.append(rns_ops.fastbconv_sk(floored, rt))

        out = a.copy()
        out.data = stack_polys(polys)
        return out

    def _ckks_multiply(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        """NTT-domain dyadic convolution (evaluator.cpp:569-708)."""
        if not (a.is_ntt_form and b.is_ntt_form):
            raise ValueError("CKKS multiply inputs must be in NTT form")
        cd = self._cd(a)
        mc = cd.mod_consts
        dest_size = a.size + b.size - 1
        out = [None] * dest_size
        for i in range(a.size):
            for j in range(b.size):
                k = i + j
                p = modring.dyadic_product(a.poly(i), b.poly(j), mc)
                out[k] = p if out[k] is None else modring.add_poly(out[k], p, mc)
        res = a.copy()
        res.data = stack_polys(out)
        res.scale = a.scale * b.scale
        _check_scale(res.scale, cd)
        return res

    def _bgv_multiply(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        """NTT-convert, dyadic convolution, convert back; correction factors
        multiply (evaluator.cpp:710-794)."""
        if a.is_ntt_form or b.is_ntt_form:
            raise ValueError("BGV multiply inputs cannot be in NTT form")
        cd = self._cd(a)
        mc = cd.mod_consts
        tables = cd.ntt_tables
        a_ntt = [ntt_mod.ntt_forward(a.poly(j), tables) for j in range(a.size)]
        b_ntt = [ntt_mod.ntt_forward(b.poly(j), tables) for j in range(b.size)]
        dest_size = a.size + b.size - 1
        out = [None] * dest_size
        for i in range(a.size):
            for j in range(b.size):
                k = i + j
                p = modring.dyadic_product(a_ntt[i], b_ntt[j], mc)
                out[k] = p if out[k] is None else modring.add_poly(out[k], p, mc)
        polys = [ntt_mod.ntt_inverse(p, tables) for p in out]
        res = a.copy()
        res.data = stack_polys(polys)
        t = cd.parms.plain_modulus.value
        res.correction_factor = (a.correction_factor * b.correction_factor) % t
        return res

    # -- key switching ----------------------------------------------------------------

    def _switch_key(self, ct: Ciphertext, target, keys_tensor,
                    keys_quot=None) -> Ciphertext:
        """Key switch `target` (a [L, N] poly at ct's level, same domain as
        ct) under one kswitch key tensor [L_decomp, 2, L_key, N]; returns a
        size-2 ciphertext to ADD into ct's (c0, c1)
        (parity: evaluator.cpp:2382-2677)."""
        return self._switch_key_tail(
            ct, self._switch_key_prod(ct, target, keys_tensor,
                                      keys_quot=keys_quot))

    def _switch_key_prod(self, ct: Ciphertext, target, keys_tensor,
                         keys_quot=None):
        """Decompose + inner product, reduced to [0, q): the
        collective-bearing half of key switching. TPEvaluator overrides
        this (parallel/keyswitch.py) to shard the decomposition axis over
        'tp' with one exact psum — both the standard and the fused
        (relinearize_rescale) tails consume its output."""
        return self._switch_key_reduce(
            ct, self._switch_key_decompose(ct, target), keys_tensor,
            keys_quot=keys_quot)

    def _key_quot(self, keys_obj, index: int):
        """Shoup quotients floor(k·2^64/q) for one loaded kswitch key tensor
        (config.keyswitch_shoup), computed as ONE jitted call the first time
        a key is used and cached on the key object — the runtime analogue of
        the reference precomputing MultiplyUIntModOperand quotients at key
        load. Returns None for tracer keys (a cache would leak tracers) or
        when the feature is off; callers then use the 128-bit route."""
        from seal_tpu.config import config as cfg, pallas_keyswitch_enabled

        if not cfg.keyswitch_shoup:
            return None
        pair = keys_obj.keys[index]
        if pair is None:
            return None
        if not pallas_keyswitch_enabled(int(pair[0].shape[-1])):
            return None  # only the Pallas contraction has a Shoup route
        if any(isinstance(a, jax.core.Tracer) for a in pair):
            return None
        cache = keys_obj.__dict__.setdefault("_shoup_quot", {})
        hit = cache.get(index)
        if hit is None or hit[0] is not pair[0]:
            # keyed on the tensor object itself: replacing keys_obj.keys[i]
            # (e.g. a device_put to another chip) invalidates the entry.
            # ensure_compile_time_eval: the first use may be inside a user
            # jit trace — compute the quotients eagerly THERE so a concrete
            # array (not a tracer) lands in this cross-trace cache
            key_moduli = tuple(
                int(m) for m in self.context.key_context_data().key_moduli())
            with jax.ensure_compile_time_eval():
                hit = (pair[0], _key_quot_fn(key_moduli)(pair[0], pair[1]))
            cache[index] = hit
        return hit[1]

    def _switch_key_decompose(self, ct: Ciphertext, target) -> limb.U64Pair:
        """RNS-decompose `target` and lift each row into the special-prime-
        extended base, NTT'd: t_op[J=L, I=L+1, N]. This is the expensive,
        key-independent half of key switching (evaluator.cpp:2475-2514) —
        hoisted rotations share it across many Galois elements."""
        ctx = self.context
        cd = self._cd(ct)
        key_cd = ctx.key_context_data()
        scheme = cd.parms.scheme
        L = cd.coeff_modulus_size
        key_moduli = key_cd.key_moduli()
        L_key = len(key_moduli)
        key_tables = key_cd.ntt_tables
        alpha = key_cd.parms.special_modulus_size

        # extended row indices: decomp primes then the special prime(s)
        key_indices = list(range(L)) + list(range(L_key - alpha, L_key))
        ext_tables = ntt_mod.gather_tables(key_tables, key_indices)
        ext_moduli = [key_moduli[i] for i in key_indices]
        ext_mc = modring.make_mod_consts(ext_moduli)

        # t_target in coefficient domain [L, N]
        t_target = target
        if scheme == SchemeType.CKKS:
            t_target = ntt_mod.ntt_inverse(target, cd.ntt_tables)

        if alpha > 1:
            # hybrid digits (ops/hybrid_keyswitch.py): [d, I, N] rows
            from seal_tpu.ops import hybrid_keyswitch as hyb

            y = hyb.decompose(t_target, tuple(key_moduli), alpha, L, ext_mc)
            if scheme != SchemeType.CKKS:
                return ntt_mod.ntt_forward(y, ext_tables)
            # hybrid diagonal skip (r2): for i in T_j the fast conversion is
            # exact, so the NTT-form target row substitutes for the
            # transform — ceil(L/a)*(L+a) − L forward rows
            d = y[0].shape[0]
            dig_of = [min(i // alpha, d - 1) for i in range(L)]
            return hyb.diag_skip_ntt(y, target, ext_tables, L, alpha, dig_of)

        # build t_operand[J, I, N]: target row J reduced into extended row I
        # and NTT'd in row I's domain
        n = t_target[0].shape[-1]
        tt_lo = jnp.broadcast_to(t_target[0][:, None, :], (L, L + 1, n))
        tt_hi = jnp.broadcast_to(t_target[1][:, None, :], (L, L + 1, n))
        ext_q = tuple(a[None, :, :] for a in ext_mc.q)          # [1, L+1, 1]
        ext_r1 = tuple(a[None, :, :] for a in ext_mc.ratio1)
        reduced = limb.barrett_reduce_64((tt_lo, tt_hi), ext_q, ext_r1)
        if scheme == SchemeType.CKKS:
            # diagonal skip (r2): rows I == J already exist in NTT form in
            # the input (SEAL's eye shortcut, evaluator.cpp:2488-2496), so
            # their forward NTTs are never computed — L*(L+1) -> L*L
            # transform rows. The alpha=1 special case of the digit map.
            from seal_tpu.ops import hybrid_keyswitch as hyb

            return hyb.diag_skip_ntt(
                reduced, target, ext_tables, L, 1, list(range(L)))
        # NTT over the extended-tower axis (axis -2), batched over J
        return ntt_mod.ntt_forward(reduced, ext_tables)          # [J=L, I=L+1, N]

    def _switch_key_inner(self, ct: Ciphertext, t_op, keys_tensor,
                          keys_quot=None) -> Ciphertext:
        """Inner product of a decomposed target with one kswitch key, then
        division by the special prime (evaluator.cpp:2517-2676)."""
        return self._switch_key_tail(ct, self._switch_key_reduce(
            ct, t_op, keys_tensor, keys_quot=keys_quot))

    def _permuted_key_quot(self, galois_keys, elt, gt):
        """Shoup quotients of one PERMUTED galois key (_permuted_keys),
        cached per elt on the key object — quot(perm(k)) for the hoisted
        rotation contraction (the permutation is a coefficient gather, so
        permuted keys need their own quotients of the same shape)."""
        from seal_tpu.config import config as cfg, pallas_keyswitch_enabled

        if not cfg.keyswitch_shoup:
            return None
        pk = self._permuted_keys(galois_keys, elt, gt)
        if not pallas_keyswitch_enabled(int(pk[0].shape[-1])):
            return None
        if any(isinstance(a, jax.core.Tracer) for a in pk):
            return None
        cache = galois_keys.__dict__.setdefault("_perm_quot", {})
        hit = cache.get(elt)
        if hit is None or hit[0] is not pk[0]:
            key_moduli = tuple(
                int(m) for m in self.context.key_context_data().key_moduli())
            with jax.ensure_compile_time_eval():
                hit = (pk[0], _key_quot_fn(key_moduli)(pk[0], pk[1]))
            cache[elt] = hit
        return hit[1]

    def _switch_key_reduce(self, ct: Ciphertext, t_op, keys_tensor,
                           keys_quot=None):
        """⟨decomposed target, key⟩ with 128-bit lazy accumulation, reduced
        to [0, q): prod[c] = U64Pair [L+1, N] (evaluator.cpp:2517-2547).
        With keys_quot (the _key_quot cache) and a contraction whose lazy
        sum provably fits u64, the Shoup-quotient route replaces the 128-bit
        accumulation — bit-identical, ~half the VPU multiplies. The
        TP-sharded variant lives in parallel/keyswitch.py (psum over
        decomp shards) and feeds the same _switch_key_tail."""
        ctx = self.context
        cd = self._cd(ct)
        key_cd = ctx.key_context_data()
        L = cd.coeff_modulus_size
        key_moduli = key_cd.key_moduli()
        L_key = len(key_moduli)
        alpha = key_cd.parms.special_modulus_size
        key_indices = list(range(L)) + list(range(L_key - alpha, L_key))
        ext_moduli = [key_moduli[i] for i in key_indices]
        ext_mc = modring.make_mod_consts(ext_moduli)
        n = t_op[0].shape[-1]
        d = t_op[0].shape[0]  # decomp count: L, or ceil(L/alpha) hybrid

        # key rows gathered to the extended tower: [d, 2, L+alpha, N]
        klo, khi = keys_tensor
        klo = klo[:d, :, jnp.asarray(key_indices), :]
        khi = khi[:d, :, jnp.asarray(key_indices), :]

        from seal_tpu.config import _on_tpu_backend, pallas_keyswitch_enabled

        if pallas_keyswitch_enabled(n):
            from seal_tpu.ops import keyswitch_pallas as ksp

            if (keys_quot is not None
                    and 2 * d * max(int(m) for m in ext_moduli) < (1 << 64)):
                qlo = keys_quot[0][:d, :, jnp.asarray(key_indices), :]
                qhi = keys_quot[1][:d, :, jnp.asarray(key_indices), :]
                lo, hi = ksp.keyswitch_inner_shoup_pallas(
                    t_op, (klo, khi), (qlo, qhi),
                    ksp.pack_mod_consts(ext_moduli),
                    interpret=not _on_tpu_backend())
                return [(lo[0], hi[0]), (lo[1], hi[1])]

            lo, hi = ksp.keyswitch_inner_pallas(
                t_op, (klo, khi), ksp.pack_mod_consts(ext_moduli),
                interpret=not _on_tpu_backend())
            return [(lo[0], hi[0]), (lo[1], hi[1])]

        # inner product over J with 128-bit accumulation: out [2, L+alpha, N]
        acc = [
            tuple(jnp.zeros((L + alpha, n), dtype=jnp.uint32) for _ in range(4))
            for _ in range(2)
        ]
        for J in range(d):
            tj = (t_op[0][J], t_op[1][J])                        # [L+alpha, N]
            for c in range(2):
                kc = (klo[J, c], khi[J, c])                      # [L+alpha, N]
                acc[c] = limb.mul_add_128(acc[c], tj, kc)
        prod = []
        for c in range(2):
            prod.append(limb.barrett_reduce_128(
                (acc[c][0], acc[c][1]), (acc[c][2], acc[c][3]),
                ext_mc.q, ext_mc.ratio0, ext_mc.ratio1,
            ))
        return prod

    def _switch_key_tail(self, ct: Ciphertext, prod) -> Ciphertext:
        """Divide the reduced inner product by the special prime and emit a
        size-2 delta ciphertext (evaluator.cpp:2572-2676)."""
        ctx = self.context
        cd = self._cd(ct)
        key_cd = ctx.key_context_data()
        scheme = cd.parms.scheme
        L = cd.coeff_modulus_size
        key_moduli = key_cd.key_moduli()
        L_key = len(key_moduli)
        key_tables = key_cd.ntt_tables
        rt_key = key_cd.rns_tool_host
        qk = key_moduli[-1]
        last_tables = ntt_mod.slice_tables(key_tables, L_key - 1, L_key)
        lvl_tables = cd.ntt_tables
        mc = cd.mod_consts
        alpha = key_cd.parms.special_modulus_size
        if alpha > 1:
            from seal_tpu.ops import hybrid_keyswitch as hyb

            special_tables = ntt_mod.slice_tables(
                key_tables, L_key - alpha, L_key)
            t_mod = (cd.parms.plain_modulus.value
                     if scheme != SchemeType.CKKS else 0)
            out_polys = [
                hyb.mod_down(
                    prod[c], scheme == SchemeType.BGV, tuple(key_moduli),
                    alpha, L, t_mod, lvl_tables, special_tables, mc,
                    is_ntt_out=(scheme == SchemeType.CKKS))
                for c in range(2)
            ]
            return Ciphertext(
                stack_polys(out_polys), parms_id=ct.parms_id,
                is_ntt_form=ct.is_ntt_form, scale=ct.scale,
                correction_factor=ct.correction_factor,
            )
        out_polys = []
        if scheme == SchemeType.BGV:
            t_mod = cd.parms.plain_modulus.value
            tmc = modring.make_mod_consts([t_mod])
            qk_inv_qp = rt_key.inv_q_last_mod_t
            for c in range(2):
                rows = prod[c]
                t_last = (rows[0][L:], rows[1][L:])              # [1, N]
                t_last = ntt_mod.ntt_inverse(t_last, last_tables)
                k = limb.barrett_reduce_64(t_last, tmc.q, tmc.ratio1)
                k = limb.neg_mod(k, tmc.q)
                if qk_inv_qp != 1:
                    op, qt = modring.shoup_pair([[qk_inv_qp]], [[t_mod]], shape=(1, 1))
                    k = limb.mul_mod_shoup(k, op, qt, tmc.q)
                body = ntt_mod.ntt_inverse((rows[0][:L], rows[1][:L]), lvl_tables)
                delta = limb.barrett_reduce_64(k, mc.q, mc.ratio1)
                delta = limb.mul_mod(delta, _const_pair(qk), mc.q, mc.ratio0, mc.ratio1)
                c_mod = limb.barrett_reduce_64(t_last, mc.q, mc.ratio1)
                summed = limb.add64(
                    body, limb.sub64(limb.sub64(mc.two_q, delta), c_mod)
                )
                op, qt = modring.shoup_pair(
                    [[v] for v in rt_key.inv_q_last_mod_q[:L]],
                    [[q] for q in key_moduli[:L]], shape=(L, 1))
                out_polys.append(limb.mul_mod_shoup(summed, op, qt, mc.q))
        else:
            qk_half = qk >> 1
            last_mc = modring.make_mod_consts([qk])
            half_mod = [qk_half % q for q in key_moduli[:L]]
            for c in range(2):
                rows = prod[c]
                t_last = (rows[0][L:], rows[1][L:])
                t_last = ntt_mod.ntt_inverse(t_last, last_tables)
                t_last = limb.add_mod(
                    t_last, _const_pair(qk_half), last_mc.q
                )
                body = (rows[0][:L], rows[1][:L])                 # NTT domain
                t_red = limb.barrett_reduce_64(t_last, mc.q, mc.ratio1)
                fix = limb.sub64(mc.q, to_device(
                    np.asarray(half_mod, dtype=np.uint64).reshape(L, 1)))
                t_red = limb.add64(t_red, fix)                    # < 2q_i
                if scheme == SchemeType.CKKS:
                    t_red = ntt_mod.ntt_forward(t_red, lvl_tables, lazy=True)
                else:
                    body = ntt_mod.ntt_inverse(body, lvl_tables, lazy=True)
                qi_lazy = limb.shl64(mc.q, 2)
                summed = limb.sub64(limb.add64(body, qi_lazy), t_red)
                op, qt = modring.shoup_pair(
                    [[v] for v in rt_key.inv_q_last_mod_q[:L]],
                    [[q] for q in key_moduli[:L]], shape=(L, 1))
                out_polys.append(limb.mul_mod_shoup(summed, op, qt, mc.q))

        return Ciphertext(
            stack_polys(out_polys), parms_id=ct.parms_id,
            is_ntt_form=ct.is_ntt_form, scale=ct.scale,
            correction_factor=ct.correction_factor,
        )

    def relinearize(self, ct: Ciphertext, relin_keys: RelinKeys) -> Ciphertext:
        """Reduce ciphertext size back to 2 (evaluator.cpp:1104-1159)."""
        if relin_keys.parms_id != self.context.key_parms_id:
            raise ValueError("relin_keys is not valid for encryption parameters")
        if ct.size == 2:
            return ct.copy()
        cur = ct
        while cur.size > 2:
            cur = self._relin_step(cur, relin_keys)
        self._check_transparent(cur)
        return cur

    def _relin_step(self, cur: Ciphertext, relin_keys: RelinKeys) -> Ciphertext:
        """Absorb the highest ciphertext power via one key switch
        (the body of evaluator.cpp:1104-1159's loop)."""
        cd = self._cd(cur)
        size = cur.size
        target = cur.poly(size - 1)
        delta = self._switch_key(
            cur, target, relin_keys.key(size - 1),
            keys_quot=self._key_quot(
                relin_keys, relin_keys.get_index(size - 1)))
        lo = cur.data[0][:size - 1]
        hi = cur.data[1][:size - 1]
        base = Ciphertext((lo, hi), cur.parms_id, cur.is_ntt_form,
                          cur.scale, cur.correction_factor)
        mc = cd.mod_consts
        c0 = modring.add_poly(base.poly(0), delta.poly(0), mc)
        c1 = modring.add_poly(base.poly(1), delta.poly(1), mc)
        polys = [c0, c1] + [base.poly(j) for j in range(2, size - 1)]
        base.data = stack_polys(polys)
        return base

    def relinearize_rescale(self, ct: Ciphertext, relin_keys: RelinKeys) -> Ciphertext:
        """Fused CKKS relinearize + rescale_to_next (beyond-reference fast
        path; the reference always runs evaluator.cpp:2616-2675 ÷P followed
        by evaluator.cpp:1441-1479 ÷q_last sequentially).

        The ciphertext body is lifted into the keyswitch dividend as
        P·(c0, c1) + ⟨decomp(c2), ksk⟩, and ONE centered division by
        P·q_last replaces the two sequential mod-downs — saving 2L NTT rows
        per call (pinned by tests/test_fused_relin_rescale.py). The result
        equals round((c + prod/P)/q_last) up to a few units of last-prime
        rounding, so it is NOT bit-exact to the sequential pair (documented
        fast-path exception, like rotate_batch_hoisted); it decrypts to the
        same values within noise, which the tests bound against the
        sequential output."""
        if self._scheme() != SchemeType.CKKS:
            raise ValueError("unsupported operation for scheme type")
        if relin_keys.parms_id != self.context.key_parms_id:
            raise ValueError("relin_keys is not valid for encryption parameters")
        cd = self._cd(ct)
        if cd.next_context_data is None:
            raise ValueError("end of modulus switching chain reached")
        cur = ct
        while cur.size > 3:
            cur = self._relin_step(cur, relin_keys)
        if cur.size == 2:
            return self.rescale_to_next(cur)

        from seal_tpu.ops import hybrid_keyswitch as hyb

        ctx = self.context
        key_cd = ctx.key_context_data()
        L = cd.coeff_modulus_size
        key_moduli = key_cd.key_moduli()
        L_key = len(key_moduli)
        key_tables = key_cd.ntt_tables
        alpha = key_cd.parms.special_modulus_size
        mc = cd.mod_consts
        next_cd = cd.next_context_data

        target = cur.poly(2)
        prod = self._switch_key_prod(
            cur, target, relin_keys.key(2),
            keys_quot=self._key_quot(relin_keys, relin_keys.get_index(2)))

        # the combined divisor tower: q_last then the alpha special primes
        km2 = tuple(cd.key_moduli()) + tuple(key_moduli[L_key - alpha:])
        spec_tables = ntt_mod.gather_tables(
            key_tables, [L - 1] + list(range(L_key - alpha, L_key)))
        pm_op, pm_qt = hyb.fused_rescale_consts(tuple(key_moduli), alpha, L)

        out_polys = []
        for c in range(2):
            body = cur.poly(c)                               # NTT, [L, N] < q
            lift = limb.mul_mod_shoup(body, pm_op, pm_qt, mc.q)
            data = limb.add_mod(
                (prod[c][0][:L], prod[c][1][:L]), lift, mc.q)
            rows = (
                jnp.concatenate([data[0], prod[c][0][L:]], axis=0),
                jnp.concatenate([data[1], prod[c][1][L:]], axis=0),
            )
            out_polys.append(hyb.mod_down(
                rows, False, km2, alpha + 1, L - 1, 0,
                next_cd.ntt_tables, spec_tables, next_cd.mod_consts,
                is_ntt_out=True))

        out = Ciphertext(
            stack_polys(out_polys), parms_id=tuple(next_cd.parms_id),
            is_ntt_form=cur.is_ntt_form,
            scale=cur.scale / cd.key_moduli()[-1],
            correction_factor=cur.correction_factor,
        )
        self._check_transparent(out)
        return out

    @staticmethod
    def _check_transparent(ct: Ciphertext):
        """SEAL_THROW_ON_TRANSPARENT_CIPHERTEXT parity (CMakeLists.txt:248,
        evaluator.cpp:1152-1158), gated by config like the CMake option."""
        from seal_tpu.config import config

        if config.throw_on_transparent_ciphertext and ct.is_transparent():
            raise ValueError("result ciphertext is transparent")

    # -- modulus switching -----------------------------------------------------------

    def mod_switch_to_next(self, ct: Ciphertext) -> Ciphertext:
        cd = self._cd(ct)
        if cd.next_context_data is None:
            raise ValueError("end of modulus switching chain reached")
        scheme = self._scheme()
        next_cd = cd.next_context_data
        rt = cd.rns_tool_device
        polys = []
        for j in range(ct.size):
            p = ct.poly(j)
            if scheme == SchemeType.BFV:
                p = rns_ops.divide_and_round_q_last(p, rt)
            elif scheme == SchemeType.CKKS:
                # drop the last RNS row, no scaling (mod_switch_drop_to_next)
                p = (p[0][:-1], p[1][:-1])
            else:  # BGV
                p = rns_ops.mod_t_and_divide_q_last(p, rt)
            polys.append(p)
        out = Ciphertext(
            stack_polys(polys), parms_id=tuple(next_cd.parms_id),
            is_ntt_form=ct.is_ntt_form, scale=ct.scale,
            correction_factor=ct.correction_factor,
        )
        if scheme == SchemeType.BGV:
            t = cd.parms.plain_modulus.value
            inv = cd.rns_tool_host.inv_q_last_mod_t
            out.correction_factor = (ct.correction_factor * inv) % t
        return out

    def _check_switch_target(self, cur_parms_id, parms_id) -> tuple:
        """Validate that `parms_id` is on the chain at or below the current
        level (evaluator.cpp mod_switch_to_inplace: 'cannot switch to higher
        level modulus' / 'parms_id is not valid')."""
        target = tuple(parms_id)
        cur_cd = self.context.get_context_data(cur_parms_id)
        tgt_cd = self.context.get_context_data(target)
        if cur_cd is None or tgt_cd is None:
            raise ValueError("parms_id is not valid for encryption parameters")
        if cur_cd.chain_index < tgt_cd.chain_index:
            raise ValueError("cannot switch to higher level modulus")
        return target

    def mod_switch_to(self, ct: Ciphertext, parms_id) -> Ciphertext:
        target = self._check_switch_target(ct.parms_id, parms_id)
        cur = ct
        while cur.parms_id != target:
            cur = self.mod_switch_to_next(cur)
        return cur

    def mod_switch_plain_to_next(self, plain: Plaintext) -> Plaintext:
        """Drop the last RNS component of an NTT-form (CKKS) plaintext
        (evaluator.cpp mod_switch_to_next(Plaintext) overload: NTT plaintexts
        mod-switch by dropping rows, no scaling)."""
        if not plain.is_ntt_form or plain.rns_data is None:
            raise ValueError("plain is not in NTT form")
        cd = self.context.get_context_data(plain.parms_id)
        if cd.next_context_data is None:
            raise ValueError("end of modulus switching chain reached")
        out = Plaintext()
        out.rns_data = (plain.rns_data[0][:-1], plain.rns_data[1][:-1])
        out.parms_id = tuple(cd.next_context_data.parms_id)
        out.scale = plain.scale
        return out

    def mod_switch_plain_to(self, plain: Plaintext, parms_id) -> Plaintext:
        target = self._check_switch_target(plain.parms_id, parms_id)
        cur = plain
        while cur.parms_id != target:
            cur = self.mod_switch_plain_to_next(cur)
        return cur

    def rescale_to_next(self, ct: Ciphertext) -> Ciphertext:
        """CKKS rescaling (evaluator.cpp:1441-1479)."""
        if self._scheme() != SchemeType.CKKS:
            raise ValueError("unsupported operation for scheme type")
        cd = self._cd(ct)
        if cd.next_context_data is None:
            raise ValueError("end of modulus switching chain reached")
        rt = cd.rns_tool_device
        polys = [
            rns_ops.divide_and_round_q_last_ntt(ct.poly(j), rt, cd.ntt_tables)
            for j in range(ct.size)
        ]
        next_cd = cd.next_context_data
        out = Ciphertext(
            stack_polys(polys), parms_id=tuple(next_cd.parms_id),
            is_ntt_form=ct.is_ntt_form,
            scale=ct.scale / cd.key_moduli()[-1],
            correction_factor=ct.correction_factor,
        )
        return out

    def rescale_to(self, ct: Ciphertext, parms_id) -> Ciphertext:
        target = self._check_switch_target(ct.parms_id, parms_id)
        cur = ct
        while cur.parms_id != target:
            cur = self.rescale_to_next(cur)
        return cur

    # -- plaintext operations -----------------------------------------------------------

    def add_plain(self, ct: Ciphertext, plain: Plaintext) -> Ciphertext:
        return self._plain_add_sub(ct, plain, add=True)

    def sub_plain(self, ct: Ciphertext, plain: Plaintext) -> Ciphertext:
        return self._plain_add_sub(ct, plain, add=False)

    def _plain_add_sub(self, ct: Ciphertext, plain: Plaintext, add: bool) -> Ciphertext:
        cd = self._cd(ct)
        scheme = self._scheme()
        mc = cd.mod_consts
        out = ct.copy()
        if scheme == SchemeType.BFV:
            if plain.is_ntt_form:
                raise ValueError("plain cannot be in NTT form")
            from seal_tpu.encryptor import _scaled_plain_rows

            scaled = to_device(_scaled_plain_rows(plain, cd))
            op = modring.add_poly if add else modring.sub_poly
            c0 = op(ct.poly(0), scaled, mc)
        elif scheme == SchemeType.CKKS:
            if not plain.is_ntt_form or plain.rns_data is None:
                raise ValueError("plain must be in NTT form")
            if not _scales_close(ct.scale, plain.scale):
                raise ValueError("scale mismatch")
            op = modring.add_poly if add else modring.sub_poly
            c0 = op(ct.poly(0), plain.rns_data, mc)
        else:  # BGV: plain scaled by the correction factor
            if plain.is_ntt_form:
                raise ValueError("plain cannot be in NTT form")
            t = cd.parms.plain_modulus.value
            moduli = cd.key_moduli()
            n = cd.parms.poly_modulus_degree
            vals = [
                (int(v) * ct.correction_factor) % t for v in plain.data.tolist()
            ]
            rows = np.zeros((len(moduli), n), dtype=np.uint64)
            for j, q in enumerate(moduli):
                rows[j, :len(vals)] = np.asarray([v % q for v in vals], dtype=np.uint64)
            op = modring.add_poly if add else modring.sub_poly
            c0 = op(ct.poly(0), to_device(rows), mc)
        out.data = (
            ct.data[0].at[0].set(c0[0]),
            ct.data[1].at[0].set(c0[1]),
        )
        return out

    def multiply_plain(self, ct: Ciphertext, plain: Plaintext) -> Ciphertext:
        cd = self._cd(ct)
        scheme = self._scheme()
        mc = cd.mod_consts
        if ct.is_ntt_form and plain.is_ntt_form:
            # both NTT (CKKS standard path)
            prod = [
                modring.dyadic_product(ct.poly(j), plain.rns_data, mc)
                for j in range(ct.size)
            ]
            out = ct.copy()
            out.data = stack_polys(prod)
            out.scale = ct.scale * plain.scale
            _check_scale(out.scale, cd)
            return out
        if plain.is_ntt_form or ct.is_ntt_form:
            raise ValueError("NTT form mismatch")
        # multiply_plain_normal (evaluator.cpp:1858-1992)
        if plain.significant_coeff_count() == 0:
            raise ValueError("plain cannot be zero")
        rows = _plain_to_rns_rows(plain, cd)
        if np.count_nonzero(plain.data) == 1:
            # monomial fast path (evaluator.cpp:1884-1930): one exact O(N)
            # roll+scalar multiply instead of 3 NTT passes — bit-identical,
            # all arithmetic exact. rows[:, e] already carries the
            # upper-half-lifted coefficient per prime.
            e = plain.significant_coeff_count() - 1
            L = rows.shape[0]
            moduli = [int(m) for m in cd.key_moduli()]
            op, quot = modring.shoup_pair(
                [[int(rows[i, e])] for i in range(L)],
                [[q] for q in moduli])
            prod = [
                modring.negacyclic_multiply_mono(ct.poly(j), op, quot, e, mc)
                for j in range(ct.size)
            ]
            out = ct.copy()
            out.data = stack_polys(prod)
            if scheme == SchemeType.CKKS:
                out.scale = ct.scale * plain.scale
                _check_scale(out.scale, cd)
            return out
        plain_ntt = ntt_mod.ntt_forward(to_device(rows), cd.ntt_tables)
        tables = cd.ntt_tables
        prod = []
        for j in range(ct.size):
            cj = ntt_mod.ntt_forward(ct.poly(j), tables)
            cj = modring.dyadic_product(cj, plain_ntt, mc)
            prod.append(ntt_mod.ntt_inverse(cj, tables))
        out = ct.copy()
        out.data = stack_polys(prod)
        if scheme == SchemeType.CKKS:
            out.scale = ct.scale * plain.scale
        return out

    # -- NTT transforms ------------------------------------------------------------------

    def transform_to_ntt(self, ct: Ciphertext) -> Ciphertext:
        if ct.is_ntt_form:
            raise ValueError("encrypted is already in NTT form")
        cd = self._cd(ct)
        out = ct.copy()
        out.data = ntt_mod.ntt_forward(ct.data, cd.ntt_tables)
        out.is_ntt_form = True
        return out

    def transform_from_ntt(self, ct: Ciphertext) -> Ciphertext:
        if not ct.is_ntt_form:
            raise ValueError("encrypted is not in NTT form")
        cd = self._cd(ct)
        out = ct.copy()
        out.data = ntt_mod.ntt_inverse(ct.data, cd.ntt_tables)
        out.is_ntt_form = False
        return out

    def transform_plain_to_ntt(self, plain: Plaintext, parms_id) -> Plaintext:
        if plain.is_ntt_form:
            raise ValueError("plain is already in NTT form")
        cd = self.context.get_context_data(parms_id)
        rows = _plain_to_rns_rows(plain, cd)
        out = Plaintext()
        out.rns_data = ntt_mod.ntt_forward(to_device(rows), cd.ntt_tables)
        out.parms_id = tuple(parms_id)
        out.scale = plain.scale
        return out

    # -- Galois / rotations -------------------------------------------------------------

    def apply_galois(self, ct: Ciphertext, galois_elt: int, galois_keys: GaloisKeys) -> Ciphertext:
        """x -> x^elt automorphism followed by key switching
        (evaluator.cpp:2221-2323)."""
        cd = self._cd(ct)
        gt = cd.galois_tool
        if not galois_keys.has_key(galois_elt):
            raise ValueError("Galois key not present")
        if ct.size != 2:
            raise ValueError("encrypted size must be 2")
        mc = cd.mod_consts
        if ct.is_ntt_form:
            c0 = gt.apply_galois_ntt(ct.poly(0), galois_elt)
            c1 = gt.apply_galois_ntt(ct.poly(1), galois_elt)
        else:
            c0 = gt.apply_galois(ct.poly(0), galois_elt, mc)
            c1 = gt.apply_galois(ct.poly(1), galois_elt, mc)
        base = ct.copy()
        zero = zeros_pair(c1[0].shape)
        base.data = stack_polys([c0, zero])
        delta = self._switch_key(
            base, c1, galois_keys.key(galois_elt),
            keys_quot=self._key_quot(
                galois_keys, galois_keys.get_index(galois_elt)))
        out = base
        out.data = stack_polys([
            modring.add_poly(c0, delta.poly(0), mc),
            delta.poly(1),
        ])
        self._check_transparent(out)
        return out

    def rotate_rows(self, ct: Ciphertext, steps: int, galois_keys: GaloisKeys) -> Ciphertext:
        """BFV/BGV batching row rotation (evaluator.h rotate_rows)."""
        if self._scheme() not in (SchemeType.BFV, SchemeType.BGV):
            raise ValueError("unsupported scheme")
        return self._rotate_internal(ct, steps, galois_keys)

    def rotate_columns(self, ct: Ciphertext, galois_keys: GaloisKeys) -> Ciphertext:
        if self._scheme() not in (SchemeType.BFV, SchemeType.BGV):
            raise ValueError("unsupported scheme")
        return self._conjugate_internal(ct, galois_keys)

    def rotate_vector(self, ct: Ciphertext, steps: int, galois_keys: GaloisKeys) -> Ciphertext:
        """CKKS slot rotation."""
        if self._scheme() != SchemeType.CKKS:
            raise ValueError("unsupported scheme")
        return self._rotate_internal(ct, steps, galois_keys)

    def complex_conjugate(self, ct: Ciphertext, galois_keys: GaloisKeys) -> Ciphertext:
        if self._scheme() != SchemeType.CKKS:
            raise ValueError("unsupported scheme")
        return self._conjugate_internal(ct, galois_keys)

    def _rotate_internal(self, ct: Ciphertext, steps: int, galois_keys: GaloisKeys) -> Ciphertext:
        cd = self._cd(ct)
        gt = cd.galois_tool
        if steps == 0:
            return ct.copy()
        elt = gt.get_elt_from_step(steps)
        if galois_keys.has_key(elt):
            return self.apply_galois(ct, elt, galois_keys)
        # NAF decomposition fallback (evaluator.cpp:2325-2380)
        naf_steps = numth.naf(steps)
        if len(naf_steps) == 1:
            raise ValueError("Galois key not present")
        cur = ct
        for s in naf_steps:
            cur = self._rotate_internal(cur, s, galois_keys)
        return cur

    def _conjugate_internal(self, ct: Ciphertext, galois_keys: GaloisKeys) -> Ciphertext:
        cd = self._cd(ct)
        gt = cd.galois_tool
        return self.apply_galois(ct, gt.get_elt_from_step(0), galois_keys)

    # -- composite helpers ------------------------------------------------------------------

    def rotate_batch_hoisted(self, ct: Ciphertext, steps: list[int],
                             galois_keys: GaloisKeys) -> list[Ciphertext]:
        """Hoisted rotations (Halevi–Shoup): RNS-decompose + NTT the target
        c1 ONCE, then per rotation apply the Galois automorphism as a single
        NTT-domain gather on the decomposed tensor before the key inner
        product. Not present in the reference (evaluator.cpp re-decomposes
        per rotation, :2221-2323); decryptions agree, noise differs only in
        which lift of c1 mod q_j is key-switched (≡ mod q_j, so the switched
        value is identical mod q).

        Cost: 1 decomposition + k inner products, vs k×(both) unhoisted —
        for CKKS n=16384 L=8, the decomposition is ~half the rotate cost."""
        if ct.size != 2:
            raise ValueError("encrypted size must be 2")
        cd = self._cd(ct)
        gt = cd.galois_tool
        mc = cd.mod_consts
        elts = [gt.get_elt_from_step(s) for s in steps]
        for s, e in zip(steps, elts):
            if s != 0 and not galois_keys.has_key(e):
                raise ValueError(f"Galois key for step {s} not present")

        t_op = self._switch_key_decompose(ct, ct.poly(1))
        c0 = ct.poly(0)
        live = [(s, e) for s, e in zip(steps, elts) if s != 0]

        # Unrolled path (default): each rotation is a STATIC-index gather on
        # t_op — XLA compiles those into cheap shuffles, where the scan
        # path's dynamic-index gathers hit the slow gather unit. Program
        # size grows linearly in the batch, so very large batches fall back
        # to lax.scan (pass key tensors as jit arguments, e.g. via
        # JitEvaluator, to keep the unrolled program payload small).
        if len(live) <= 16:
            by_step = {}
            for s, elt in live:
                by_step[s] = self._hoisted_one(ct, t_op, c0, elt, gt, mc,
                                               galois_keys)
            return [by_step[s] if s != 0 else ct.copy() for s in steps]

        # lax.scan over the rotation axis: the compiled program holds ONE
        # keyswitch inner product, not k unrolled copies (program size —
        # and remote-compile payload — stays O(1) in the batch size).
        perm = jnp.asarray(np.stack([gt._ntt_table(e) for _, e in live]))
        if ct.is_ntt_form:
            csrc = perm
            cneg = jnp.zeros(perm.shape, dtype=bool)
        else:
            coeff = [gt._coeff_table(e) for _, e in live]
            csrc = jnp.asarray(np.stack([c[0] for c in coeff]))
            cneg = jnp.asarray(np.stack([c[1] for c in coeff]))
        klo = jnp.stack([galois_keys.key(e)[0] for _, e in live])
        khi = jnp.stack([galois_keys.key(e)[1] for _, e in live])

        def body(_, xs):
            p, src, neg, kl, kh = xs
            t_op_g = (t_op[0][..., p], t_op[1][..., p])
            delta = self._switch_key_inner(ct, t_op_g, (kl, kh))
            g = (c0[0][..., src], c0[1][..., src])
            if not ct.is_ntt_form:
                negated = limb.neg_mod(g, mc.q)
                g = limb.select64(neg, negated, g)
            new0 = modring.add_poly(g, delta.poly(0), mc)
            new1 = delta.poly(1)
            return None, (new0[0], new0[1], new1[0], new1[1])

        _, (o0l, o0h, o1l, o1h) = jax.lax.scan(
            body, None, (perm, csrc, cneg, klo, khi))

        by_step = {}
        for i, (s, _) in enumerate(live):
            out = ct.copy()
            out.data = (
                jnp.stack([o0l[i], o1l[i]]),
                jnp.stack([o0h[i], o1h[i]]),
            )
            by_step[s] = out
        return [by_step[s] if s != 0 else ct.copy() for s in steps]

    def _hoisted_one(self, ct, t_op, c0, elt, gt, mc, galois_keys):
        """One hoisted rotation with PRE-PERMUTED keys: the automorphism
        commutes with the NTT-domain dyadic product, so
        perm(Σ_J t_op_J ⊙ perm⁻¹(key_J)) = Σ_J perm(t_op_J) ⊙ key_J — the
        per-rotation gather moves from the decomposed [L, L+1, N] tensor to
        the [2, L, N] output (≈9× fewer gathered elements; gathers are the
        TPU bottleneck for rotations, not the inner product). The special-
        prime divide commutes with the coefficient permutation up to its
        rounding tie-break, i.e. noise-level only — decryption agrees with
        apply_galois (which stays bit-exact to the reference)."""
        delta = self._switch_key_inner(
            ct, t_op, self._permuted_keys(galois_keys, elt, gt),
            keys_quot=self._permuted_key_quot(galois_keys, elt, gt))
        out = ct.copy()
        if ct.is_ntt_form:
            out0 = gt.apply_galois_ntt(
                modring.add_poly(c0, delta.poly(0), mc), elt)
            out1 = gt.apply_galois_ntt(delta.poly(1), elt)
        else:
            out0 = gt.apply_galois(
                modring.add_poly(c0, delta.poly(0), mc), elt, mc)
            out1 = gt.apply_galois(delta.poly(1), elt, mc)
        out.data = stack_polys([out0, out1])
        return out

    @staticmethod
    def _permuted_keys(galois_keys, elt, gt):
        """galois key for `elt` gathered by the INVERSE NTT-domain
        permutation, cached on the key object (static per elt)."""
        cache = getattr(galois_keys, "_perm_cache", None)
        if cache is None:
            cache = {}
            galois_keys._perm_cache = cache
        pk = cache.get(elt)
        if pk is None:
            inv = np.argsort(gt._ntt_table(elt), kind="stable")
            klo, khi = galois_keys.key(elt)
            pk = (jnp.asarray(klo)[..., inv], jnp.asarray(khi)[..., inv])
            import jax.core

            if not isinstance(klo, jax.core.Tracer):
                pk = tuple(jax.block_until_ready(p) for p in pk)
                cache[elt] = pk
        return pk

    def multiply_many(self, cts: list[Ciphertext], relin_keys: RelinKeys) -> Ciphertext:
        """Binary-tree product (evaluator.cpp:1535+)."""
        if not cts:
            raise ValueError("encrypteds cannot be empty")
        layer = list(cts)
        while len(layer) > 1:
            nxt = []
            for i in range(0, len(layer) - 1, 2):
                prod = self.relinearize(self.multiply(layer[i], layer[i + 1]), relin_keys)
                nxt.append(prod)
            if len(layer) % 2:
                nxt.append(layer[-1])
            layer = nxt
        return layer[0]

    def exponentiate(self, ct: Ciphertext, power: int, relin_keys: RelinKeys) -> Ciphertext:
        if power < 1:
            raise ValueError("exponent cannot be 0")
        if power == 1:
            return ct.copy()
        return self.multiply_many([ct] * power, relin_keys)


@functools.lru_cache(maxsize=None)
def _key_quot_fn(key_moduli: tuple):
    """Jitted Shoup-quotient builder over a whole kswitch key tensor
    [L_decomp, 2, L_key, N] (one executable per key-moduli tuple; ONE
    device dispatch per key — matters on the tunneled backend). Constants
    are built with PURE numpy: the first call may come from inside a jit
    trace (keys closed over by a user pipeline), where jnp.asarray would
    bind tracers into this cached closure."""
    qs = [int(m) for m in key_moduli]
    ratios = [(1 << 128) // q for q in qs]

    def np_u64(vals):
        lo = np.asarray([[v & 0xFFFFFFFF] for v in vals],
                        dtype=np.uint32)[None, None]
        hi = np.asarray([[(v >> 32) & 0xFFFFFFFF] for v in vals],
                        dtype=np.uint32)[None, None]
        return lo, hi

    q = np_u64(qs)
    r0 = np_u64([r & ((1 << 64) - 1) for r in ratios])
    r1 = np_u64([r >> 64 for r in ratios])

    def f(klo, khi):
        return limb.shoup_quotient((klo, khi), q, r0, r1)

    return jax.jit(f)


def _scales_close(a: float, b: float) -> bool:
    return abs(a - b) <= max(abs(a), abs(b)) * 1e-10


def _check_scale(scale: float, cd: ContextData):
    """Scale must stay positive and below the total coeff modulus
    (evaluator.cpp is_scale_within_bounds)."""
    if not (scale > 0) or int(scale).bit_length() >= cd.total_coeff_modulus_bit_count:
        raise ValueError("scale out of bounds")


def _const_pair(v: int):
    return to_device(np.asarray([[v]], dtype=np.uint64))


def _plain_to_rns_rows(plain: Plaintext, cd) -> np.ndarray:
    """Lift a mod-t plaintext into [L, N] RNS rows with upper-half wrap
    (evaluator.cpp multiply_plain_normal / transform_plain_to_ntt)."""
    moduli = cd.key_moduli()
    n = cd.parms.poly_modulus_degree
    thresh = cd.plain_upper_half_threshold
    inc = cd.plain_upper_half_increment
    rows = np.zeros((len(moduli), n), dtype=np.uint64)
    fast = cd.qualifiers.using_fast_plain_lift
    if fast:
        for j in range(len(moduli)):
            vals = plain.data
            up = vals >= np.uint64(thresh)
            rows[j, :len(vals)] = np.where(up, vals + np.uint64(inc[j]), vals)
    else:
        Q = cd.total_coeff_modulus
        t_half = thresh
        for i, v in enumerate(plain.data.tolist()):
            lifted = v + (Q - cd.parms.plain_modulus.value) if v >= t_half else v
            for j, q in enumerate(moduli):
                rows[j, i] = lifted % q
    return rows


# ---------------------------------------------------------------------------
# Reference-compat `*_inplace` variants (evaluator.h declares an _inplace
# overload for every mutating op). seal_tpu ciphertexts are immutable
# pytrees, so these are thin wrappers: run the functional op, then rebind
# the result's state onto the first argument (same object identity) so
# reference call sites port verbatim. See docs/MIGRATING.md §Evaluator.
# ---------------------------------------------------------------------------

_INPLACE_METHODS = (
    "negate", "add", "sub", "multiply", "square", "relinearize",
    "mod_switch_to_next", "mod_switch_to", "rescale_to_next", "rescale_to",
    "add_plain", "sub_plain", "multiply_plain",
    "transform_to_ntt", "transform_from_ntt",
    "apply_galois", "rotate_rows", "rotate_columns", "rotate_vector",
    "complex_conjugate", "exponentiate",
)


def _make_inplace(name: str):
    def method(self, ct, *args, **kwargs):
        out = getattr(self, name)(ct, *args, **kwargs)
        if out is not ct:
            # no-op paths (e.g. mod_switch_to at the current level) return
            # ct itself — clearing then would wipe the shared __dict__
            ct.__dict__.clear()
            ct.__dict__.update(out.__dict__)
        return ct

    method.__name__ = name + "_inplace"
    method.__qualname__ = f"Evaluator.{name}_inplace"
    method.__doc__ = (
        f"Reference-compat: `{name}` with the result rebound onto `ct` "
        f"(same object identity; the op itself stays functional)."
    )
    return method


for _name in _INPLACE_METHODS:
    setattr(Evaluator, _name + "_inplace", _make_inplace(_name))
del _name
