"""Evaluator API surface beyond the bit-exact golden suites: specialized
squares (== multiply(a,a) bit-for-bit), add_many, plaintext mod-switch.
Reference parity: evaluator.cpp bfv/ckks/bgv_square :831-1103, add_many,
mod_switch_to_next(Plaintext)."""

import numpy as np
import pytest

from seal_tpu import (
    BatchEncoder,
    CoeffModulus,
    Decryptor,
    EncryptionParameters,
    Encryptor,
    Evaluator,
    KeyGenerator,
    Plaintext,
    SEALContext,
    SchemeType,
    SecLevelType,
)
from seal_tpu.ckks import CKKSEncoder

SEED = (1, 2, 3, 4, 5, 6, 7, 8)


def _ct_equal(a, b):
    np.testing.assert_array_equal(np.asarray(a.data[0]), np.asarray(b.data[0]))
    np.testing.assert_array_equal(np.asarray(a.data[1]), np.asarray(b.data[1]))


def _make(scheme, plain_mod=None):
    parms = EncryptionParameters(scheme)
    parms.set_poly_modulus_degree(64)
    parms.set_coeff_modulus(CoeffModulus.create(64, [40, 40, 40]))
    if plain_mod is not None:
        parms.set_plain_modulus(plain_mod)
    parms.set_random_seed(SEED)
    ctx = SEALContext(parms, sec_level=SecLevelType.NONE)
    kg = KeyGenerator(ctx)
    pk = kg.create_public_key()
    return ctx, kg, Encryptor(ctx, pk), Evaluator(ctx), Decryptor(ctx, kg.secret_key())


class TestSquare:
    def test_bfv_square_equals_multiply(self):
        ctx, kg, enc, ev, dec = _make(SchemeType.BFV, plain_mod=257)
        be = BatchEncoder(ctx)
        vals = list(range(be.slot_count))
        ct = enc.encrypt(be.encode(vals))
        _ct_equal(ev.square(ct), ev.multiply(ct, ct))

    def test_bgv_square_equals_multiply(self):
        ctx, kg, enc, ev, dec = _make(SchemeType.BGV, plain_mod=257)
        be = BatchEncoder(ctx)
        vals = list(range(be.slot_count))
        ct = enc.encrypt(be.encode(vals))
        sq = ev.square(ct)
        mu = ev.multiply(ct, ct)
        _ct_equal(sq, mu)
        assert sq.correction_factor == mu.correction_factor

    def test_ckks_square_equals_multiply(self):
        ctx, kg, enc, ev, dec = _make(SchemeType.CKKS)
        encd = CKKSEncoder(ctx)
        scale = 2.0 ** 30
        vals = np.linspace(-1, 1, encd.slot_count)
        ct = enc.encrypt(encd.encode(vals, scale))
        sq = ev.square(ct)
        mu = ev.multiply(ct, ct)
        _ct_equal(sq, mu)
        assert sq.scale == mu.scale

    def test_bfv_square_decrypts(self):
        ctx, kg, enc, ev, dec = _make(SchemeType.BFV, plain_mod=257)
        be = BatchEncoder(ctx)
        vals = [v % 257 for v in range(be.slot_count)]
        ct = enc.encrypt(be.encode(vals))
        rk = kg.create_relin_keys()
        out = be.decode(dec.decrypt(ev.relinearize(ev.square(ct), rk)))
        assert list(out) == [(v * v) % 257 for v in vals]


class TestAddMany:
    def test_add_many_bfv(self):
        ctx, kg, enc, ev, dec = _make(SchemeType.BFV, plain_mod=257)
        be = BatchEncoder(ctx)
        cts = [enc.encrypt(be.encode([i + 1] * be.slot_count)) for i in range(4)]
        out = be.decode(dec.decrypt(ev.add_many(cts)))
        assert list(out) == [10] * be.slot_count

    def test_add_many_empty_raises(self):
        ctx, kg, enc, ev, dec = _make(SchemeType.BFV, plain_mod=257)
        with pytest.raises(ValueError):
            ev.add_many([])


class TestPlainModSwitch:
    def test_ckks_plain_mod_switch_tracks_ciphertext(self):
        ctx, kg, enc, ev, dec = _make(SchemeType.CKKS)
        encd = CKKSEncoder(ctx)
        # after dropping one prime a single 40-bit prime remains, so the
        # product scale 2^36 must stay below it
        scale = 2.0 ** 18
        vals = np.linspace(-1, 1, encd.slot_count)
        plain = encd.encode(vals, scale)
        ct = enc.encrypt(plain)
        ct2 = ev.mod_switch_to_next(ct)
        p2 = ev.mod_switch_plain_to_next(plain)
        assert p2.parms_id == ct2.parms_id
        # multiply_plain at the switched level still decodes correctly
        prod = ev.multiply_plain(ct2, p2)
        got = encd.decode(dec.decrypt(prod))
        np.testing.assert_allclose(got.real, vals * vals, atol=1e-2)

    def test_plain_mod_switch_to(self):
        ctx, kg, enc, ev, dec = _make(SchemeType.CKKS)
        encd = CKKSEncoder(ctx)
        plain = encd.encode(np.zeros(encd.slot_count), 2.0 ** 30)
        last = ctx.last_parms_id
        p = ev.mod_switch_plain_to(plain, last)
        assert p.parms_id == tuple(last)

    def test_non_ntt_plain_raises(self):
        ctx, kg, enc, ev, dec = _make(SchemeType.BFV, plain_mod=257)
        be = BatchEncoder(ctx)
        plain = be.encode([1] * be.slot_count)
        with pytest.raises(ValueError):
            ev.mod_switch_plain_to_next(plain)


class TestHoistedRotations:
    def test_bfv_hoisted_matches_rotate_rows(self):
        ctx, kg, enc, ev, dec = _make(SchemeType.BFV, plain_mod=257)
        be = BatchEncoder(ctx)
        gk = kg.create_galois_keys()
        vals = [v % 257 for v in range(be.slot_count)]
        ct = enc.encrypt(be.encode(vals))
        steps = [1, 2, -1, 0]
        hoisted = ev.rotate_batch_hoisted(ct, steps, gk)
        for s, h in zip(steps, hoisted):
            ref = ev.rotate_rows(ct, s, gk) if s else ct
            assert list(be.decode(dec.decrypt(h))) == \
                list(be.decode(dec.decrypt(ref))), f"step {s}"

    def test_ckks_hoisted_matches_rotate_vector(self):
        ctx, kg, enc, ev, dec = _make(SchemeType.CKKS)
        encd = CKKSEncoder(ctx)
        gk = kg.create_galois_keys()
        scale = 2.0 ** 30
        vals = np.arange(encd.slot_count, dtype=float) / encd.slot_count
        ct = enc.encrypt(encd.encode(vals, scale))
        steps = [1, 2, -2]
        hoisted = ev.rotate_batch_hoisted(ct, steps, gk)
        for s, h in zip(steps, hoisted):
            got = encd.decode(dec.decrypt(h)).real
            want = np.roll(vals, -s)
            np.testing.assert_allclose(got, want, atol=1e-5), f"step {s}"

    def test_missing_key_raises(self):
        ctx, kg, enc, ev, dec = _make(SchemeType.BFV, plain_mod=257)
        be = BatchEncoder(ctx)
        gt = ctx.key_context_data().galois_tool
        gk = kg.create_galois_keys(gt.get_elts_from_steps([1]))
        ct = enc.encrypt(be.encode([0] * be.slot_count))
        with pytest.raises(ValueError):
            ev.rotate_batch_hoisted(ct, [1, 5], gk)


class TestJitEvaluator:
    def test_ops_match_eager_and_cache(self):
        from seal_tpu.jit import JitEvaluator

        ctx, kg, enc, ev, dec = _make(SchemeType.BFV, plain_mod=257)
        be = BatchEncoder(ctx)
        rk = kg.create_relin_keys()
        gk = kg.create_galois_keys()
        jev = JitEvaluator(ctx)
        vals = [v % 257 for v in range(be.slot_count)]
        ct = enc.encrypt(be.encode(vals))

        jit_out = jev.relinearize(jev.multiply(ct, ct), rk)
        eager_out = ev.relinearize(ev.multiply(ct, ct), rk)
        _ct_equal(jit_out, eager_out)

        n0 = jev.cache_size()
        jev.relinearize(jev.multiply(ct, ct), rk)   # cache hit
        assert jev.cache_size() == n0

        r_jit = jev.rotate_rows(ct, 1, gk)
        r_eager = ev.rotate_rows(ct, 1, gk)
        _ct_equal(r_jit, r_eager)
        assert jev.cache_size() == n0 + 1

        # static args distinguish cache entries
        jev.rotate_rows(ct, 2, gk)
        assert jev.cache_size() == n0 + 2

    def test_inplace_via_jit_rebinds_eagerly(self):
        from seal_tpu.jit import JitEvaluator

        ctx, kg, enc, ev, dec = _make(SchemeType.BFV, plain_mod=257)
        rk = kg.create_relin_keys()
        jev = JitEvaluator(ctx)
        ct = enc.encrypt(Plaintext.from_hex_string("5"))
        want = ev.relinearize(ev.multiply(ct, ct), rk)
        c = enc.encrypt(Plaintext.from_hex_string("5"))
        out = jev.multiply_inplace(c, c)
        assert out is c
        jev.relinearize_inplace(c, rk)
        _ct_equal(c, want)
        # the compiled programs are the functional twins (shared cache)
        assert any(k[0] == "multiply" for k in jev._cache)

    def test_level_changes_recompile_transparently(self):
        from seal_tpu.jit import JitEvaluator

        ctx, kg, enc, ev, dec = _make(SchemeType.CKKS)
        encd = CKKSEncoder(ctx)
        rk = kg.create_relin_keys()
        jev = JitEvaluator(ctx)
        vals = np.linspace(-1, 1, encd.slot_count)
        # scale must survive the rescale division by the ~2^40 last prime
        ct = enc.encrypt(encd.encode(vals, 2.0 ** 36))
        ct2 = jev.rescale_to_next(jev.relinearize(jev.multiply(ct, ct), rk))
        assert ct2.parms_id != ct.parms_id
        got = encd.decode(dec.decrypt(ct2))
        np.testing.assert_allclose(got.real, vals * vals, atol=1e-2)


class TestHoistedNoiseBound:
    def test_ckks_hoisted_within_noise_of_apply_galois(self):
        """rotate_batch_hoisted is NOT bit-exact to the reference (permuted-
        keys trick changes the keyswitch digit representatives, producing an
        equivalent ciphertext that differs by an encryption of zero); assert
        the DECRYPTED outputs agree within the keyswitch noise bound at two
        chain levels (ADVICE r1)."""
        from seal_tpu.dtypes import to_host
        from seal_tpu.ops import ntt as ntt_mod

        ctx, kg, enc, ev, dec = _make(SchemeType.CKKS)
        encd = CKKSEncoder(ctx)
        gk = kg.create_galois_keys()
        vals = np.linspace(-1, 1, encd.slot_count)
        scale = 2.0 ** 30
        ct0 = enc.encrypt(encd.encode(vals, scale))
        for level, ct in enumerate([ct0, ev.mod_switch_to_next(ct0)]):
            cd = ctx.get_context_data(ct.parms_id)
            moduli = cd.key_moduli()
            (h,) = ev.rotate_batch_hoisted(ct, [1], gk)
            r = ev.rotate_vector(ct, 1, gk)
            ph = to_host(ntt_mod.ntt_inverse(dec.decrypt(h).rns_data, cd.ntt_tables))
            pr = to_host(ntt_mod.ntt_inverse(dec.decrypt(r).rns_data, cd.ntt_tables))
            # keyswitch noise is far below the scale: bound the centered
            # per-coefficient difference by 2^14 (message units ~2^30)
            for row, q in enumerate(moduli):
                d = (ph[row].astype(object) - pr[row].astype(object)) % q
                d = np.minimum(d, q - np.asarray(d, dtype=object))
                assert int(max(d)) < 2 ** 14, (
                    f"level {level} row {row}: max diff {max(d)}"
                )


class TestDiagonalSkipDecompose:
    """The CKKS diagonal-skip decompose (r2) must equal the dense
    compute-all-rows-then-overwrite form bit-for-bit, at every level of the
    chain down to L=1 (the L=1 edge has no off-diagonal body rows at all)."""

    def _dense_decompose(self, ev, ct, target):
        """The pre-r2 formulation: NTT all L*(L+1) rows, then substitute the
        already-NTT input on the I == J diagonal."""
        import jax.numpy as jnp

        from seal_tpu.ops import limb, modring
        from seal_tpu.ops import ntt as ntt_mod2

        ctx = ev.context
        cd = ctx.get_context_data(ct.parms_id)
        key_cd = ctx.key_context_data()
        L = cd.coeff_modulus_size
        key_moduli = key_cd.key_moduli()
        key_indices = list(range(L)) + [len(key_moduli) - 1]
        ext_tables = ntt_mod2.gather_tables(key_cd.ntt_tables, key_indices)
        ext_mc = modring.make_mod_consts([key_moduli[i] for i in key_indices])
        t_target = ntt_mod2.ntt_inverse(target, cd.ntt_tables)
        n = t_target[0].shape[-1]
        tt_lo = jnp.broadcast_to(t_target[0][:, None, :], (L, L + 1, n))
        tt_hi = jnp.broadcast_to(t_target[1][:, None, :], (L, L + 1, n))
        ext_q = tuple(a[None, :, :] for a in ext_mc.q)
        ext_r1 = tuple(a[None, :, :] for a in ext_mc.ratio1)
        reduced = limb.barrett_reduce_64((tt_lo, tt_hi), ext_q, ext_r1)
        t_op = ntt_mod2.ntt_forward(reduced, ext_tables)
        eye = (jnp.arange(L)[:, None] == jnp.arange(L + 1)[None, :])
        orig_lo = jnp.broadcast_to(target[0][:, None, :], (L, L + 1, n))
        orig_hi = jnp.broadcast_to(target[1][:, None, :], (L, L + 1, n))
        return (
            jnp.where(eye[:, :, None], orig_lo, t_op[0]),
            jnp.where(eye[:, :, None], orig_hi, t_op[1]),
        )

    def test_matches_dense_every_level(self):
        parms = EncryptionParameters(SchemeType.CKKS)
        parms.set_poly_modulus_degree(64)
        parms.set_coeff_modulus(CoeffModulus.create(64, [40, 40, 40, 40]))
        parms.set_random_seed(SEED)
        ctx = SEALContext(parms, sec_level=SecLevelType.NONE)
        kg = KeyGenerator(ctx)
        enc = Encryptor(ctx, kg.create_public_key())
        ev = Evaluator(ctx)
        encd = CKKSEncoder(ctx)
        vals = np.linspace(-1, 1, encd.slot_count)
        ct = enc.encrypt(encd.encode(vals, 2.0 ** 30))
        levels = 0
        while True:
            target = ct.poly(1)
            got = ev._switch_key_decompose(ct, target)
            want = self._dense_decompose(ev, ct, target)
            np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))
            np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want[1]))
            levels += 1
            cd = ctx.get_context_data(ct.parms_id)
            if cd.coeff_modulus_size == 1:
                break
            ct = ev.mod_switch_to_next(ct)
        assert levels >= 3  # L = 3, 2, 1 all exercised

    @pytest.mark.parametrize("alpha,bits", [
        (2, [40] * 4 + [40, 40]),        # even digits
        (2, [40] * 5 + [40, 40]),        # partial last digit
        (3, [40] * 5 + [40, 40, 40]),    # ragged alpha=3
    ])
    def test_hybrid_matches_full_transform(self, alpha, bits):
        """The HYBRID diagonal skip (rows i in T_j substitute the NTT-form
        input) must equal transforming every decompose row, bit-for-bit —
        even digits, partial digits, and ragged alpha all covered."""
        from seal_tpu.ops import hybrid_keyswitch as hyb
        from seal_tpu.ops import modring
        from seal_tpu.ops import ntt as ntt_mod2

        parms = EncryptionParameters(SchemeType.CKKS)
        parms.set_poly_modulus_degree(64)
        parms.set_coeff_modulus(CoeffModulus.create(64, bits))
        parms.set_special_modulus_size(alpha)
        parms.set_random_seed(SEED)
        ctx = SEALContext(parms, sec_level=SecLevelType.NONE)
        kg = KeyGenerator(ctx)
        enc = Encryptor(ctx, kg.create_public_key())
        ev = Evaluator(ctx)
        encd = CKKSEncoder(ctx)
        ct = enc.encrypt(encd.encode(np.linspace(-1, 1, 32), 2.0 ** 30))
        cm = ev.multiply(ct, ct)
        cd = ctx.get_context_data(cm.parms_id)
        key_cd = ctx.key_context_data()
        L = cd.coeff_modulus_size
        key_moduli = key_cd.key_moduli()
        key_indices = (list(range(L))
                       + list(range(len(key_moduli) - alpha, len(key_moduli))))
        ext_tables = ntt_mod2.gather_tables(key_cd.ntt_tables, key_indices)
        ext_mc = modring.make_mod_consts([key_moduli[i] for i in key_indices])
        target = cm.poly(2)
        got = ev._switch_key_decompose(cm, target)
        t_coeff = ntt_mod2.ntt_inverse(target, cd.ntt_tables)
        y = hyb.decompose(t_coeff, tuple(key_moduli), alpha, L, ext_mc)
        want = ntt_mod2.ntt_forward(y, ext_tables)
        np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))
        np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want[1]))


def test_submap_streaming_step_bit_identical():
    """The production streaming recipe (lax.map over vmap sub-batches,
    BASELINE 'sustained') computes bit-identically to the flat vmap step
    it replaces (tools/bench_sustained.py --submap)."""
    import jax
    import jax.numpy as jnp

    ctx, kg, enc, ev, dec = _make(SchemeType.CKKS)
    rk = kg.create_relin_keys()
    encd = CKKSEncoder(ctx)
    scale = 2.0 ** 30
    proto = enc.encrypt(encd.encode(np.linspace(-1, 1, encd.slot_count), scale))

    def one(x_pair):
        ca = proto.copy()
        ca.data = x_pair
        return ev.rescale_to_next(ev.relinearize(ev.square(ca), rk)).data

    B, S = 4, 2
    x = tuple(jnp.stack([d + jnp.uint32(i) % jnp.uint32(3) for i in range(B)])
              for d in proto.data)
    flat = jax.jit(jax.vmap(one))(x)

    inner = jax.vmap(one)

    def stepped(x_pair):
        g = B // S
        xr = tuple(a.reshape((g, S) + a.shape[1:]) for a in x_pair)
        lo, hi = jax.lax.map(inner, xr)
        return (lo.reshape((B,) + lo.shape[2:]),
                hi.reshape((B,) + hi.shape[2:]))

    sub = jax.jit(stepped)(x)
    assert np.array_equal(np.asarray(flat[0]), np.asarray(sub[0]))
    assert np.array_equal(np.asarray(flat[1]), np.asarray(sub[1]))
