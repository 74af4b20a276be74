"""Shoup-quotient key-switch inner product (config.keyswitch_shoup).

The contraction ⟨decomp(target), ksk⟩ mod q is one integer per output slot;
the 128-bit-accumulation route (evaluator.cpp:2517-2547 parity) and the
Shoup-quotient route (per-term mul_mod_shoup_lazy + conditional-subtraction
chain) must emit the SAME representative in [0, q). These tests pin:
  1. limb.shoup_quotient == floor(y·2^64/q) exactly (vs Python ints),
  2. the Pallas Shoup kernel == the Pallas 128-bit kernel on random data,
  3. end-to-end relinearize/rotate with the flag on == off, byte-identical.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from seal_tpu import (
    CoeffModulus, EncryptionParameters, Encryptor, Evaluator,
    KeyGenerator, SEALContext, SecLevelType,
)
from seal_tpu.config import config
from seal_tpu.encryption_params import SchemeType
from seal_tpu.ops import keyswitch_pallas as ksp
from seal_tpu.ops import limb, modring


def test_shoup_quotient_exact():
    rng = np.random.default_rng(7)
    # quotient math needs no primality — any odd q < 2^62 (incl. the
    # 61-bit internal-prime range user moduli can't reach)
    qs = [(1 << 61) - 1]
    for qbits in (30, 44, 50, 54, 58, 60):
        qs += [int(CoeffModulus.create(8192, [qbits])[0]),
               (1 << qbits) - 1, (1 << qbits) + 1]
    for q in qs:
        ys = [0, 1, 2, q - 1, q - 2, q // 2] + [
            int(rng.integers(0, q)) for _ in range(64)]
        mc = modring.make_mod_consts([q] * len(ys))
        y_pair = limb.arr_to_u64([[y] for y in ys], shape=(len(ys), 1))
        got = limb.shoup_quotient(y_pair, mc.q, mc.ratio0, mc.ratio1)
        got_ints = limb.u64_to_ints(got).reshape(-1)
        want = [(y << 64) // q for y in ys]
        assert [int(v) for v in got_ints] == want, f"q={q}"


@pytest.mark.parametrize("J,I,n", [(4, 10, 256), (8, 9, 512), (1, 3, 256),
                                   (15, 17, 256)])
def test_shoup_kernel_matches_128bit(J, I, n):
    moduli = [int(m) for m in CoeffModulus.create(8192, [44] * I)]
    rng = np.random.default_rng(J * 1000 + I)

    # rows of t/k per extended modulus i: values < q_i
    def rand_mod_rows(lead):
        arr = np.zeros(lead + (I, n), dtype=object)
        for idx in np.ndindex(*lead):
            for i in range(I):
                arr[idx + (i,)] = rng.integers(0, moduli[i], size=n)
        lo = (arr & 0xFFFFFFFF).astype(np.uint32)
        hi = (arr >> 32).astype(np.uint32)
        return jnp.asarray(lo), jnp.asarray(hi)

    t_op = rand_mod_rows((J,))
    keys = rand_mod_rows((J, 2))
    mc = modring.make_mod_consts(moduli)
    q = tuple(a[None, None, :, :] for a in mc.q)
    r0 = tuple(a[None, None, :, :] for a in mc.ratio0)
    r1 = tuple(a[None, None, :, :] for a in mc.ratio1)
    quot = limb.shoup_quotient(keys, q, r0, r1)

    consts = ksp.pack_mod_consts(moduli)
    ref = ksp.keyswitch_inner_pallas(t_op, keys, consts, interpret=True)
    if 2 * J * max(moduli) < (1 << 64):
        got = ksp.keyswitch_inner_shoup_pallas(
            t_op, keys, quot, consts, interpret=True)
        for a, b in zip(got, ref):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    else:
        pytest.skip("contraction too wide for the lazy u64 sum")


@pytest.fixture
def ckks_ctx():
    parms = EncryptionParameters(SchemeType.CKKS)
    n = 512
    parms.set_poly_modulus_degree(n)
    parms.set_coeff_modulus(CoeffModulus.create(n, [40, 30, 30, 40]))
    parms.set_random_seed((1, 2, 3, 4, 5, 6, 7, 8))
    return SEALContext(parms, sec_level=SecLevelType.NONE)


def _relin_bytes(ctx, shoup: bool, hybrid_alpha: int = 1):
    from seal_tpu.ckks import CKKSEncoder

    old_flag, old_pallas = config.keyswitch_shoup, config.use_pallas_keyswitch
    config.keyswitch_shoup = shoup
    config.use_pallas_keyswitch = "always"   # interpret mode off-TPU
    try:
        kg = KeyGenerator(ctx)
        pk = kg.create_public_key()
        rk = kg.create_relin_keys()
        from seal_tpu.ops.galois import GaloisTool

        n_ctx = ctx.key_context_data().parms.poly_modulus_degree
        gt = GaloisTool(n_ctx.bit_length() - 1)
        gk = kg.create_galois_keys(gt.get_elts_from_steps([1]))
        enc = Encryptor(ctx, pk)
        ev = Evaluator(ctx)
        encoder = CKKSEncoder(ctx)
        scale = 2.0 ** 30
        vals = np.linspace(-1, 1, encoder.slot_count)
        ct = enc.encrypt(encoder.encode(vals, scale))
        out = ev.relinearize(ev.multiply(ct, ct), rk)
        rot = ev.rotate_vector(out, 1, gk)
        return ([np.asarray(a) for a in out.data],
                [np.asarray(a) for a in rot.data])
    finally:
        config.keyswitch_shoup = old_flag
        config.use_pallas_keyswitch = old_pallas


def test_quot_built_inside_jit_trace(ckks_ctx):
    """bench.py regression: the first _key_quot call happens while TRACING
    a user pipeline (keys closed over). The quotient builder must not bind
    outer tracers into its cached closure (r3: make_mod_consts inside the
    trace returned tracers and poisoned the lru cache)."""
    from seal_tpu.ckks import CKKSEncoder
    from seal_tpu import evaluator as ev_mod

    ev_mod._key_quot_fn.cache_clear()
    old_flag, old_pallas = config.keyswitch_shoup, config.use_pallas_keyswitch
    config.keyswitch_shoup = True
    config.use_pallas_keyswitch = "always"
    try:
        ctx = ckks_ctx
        kg = KeyGenerator(ctx)
        pk = kg.create_public_key()
        rk = kg.create_relin_keys()
        enc = Encryptor(ctx, pk)
        ev = Evaluator(ctx)
        encoder = CKKSEncoder(ctx)
        ct = enc.encrypt(encoder.encode(
            np.linspace(-1, 1, encoder.slot_count), 2.0 ** 30))

        def pipeline(x_pair):
            ca = ct.copy(); ca.data = x_pair
            return ev.relinearize(ev.multiply(ca, ca), rk).data

        jitted = jax.jit(pipeline)(ct.data)       # quot built mid-trace
        eager = pipeline(ct.data)
        for a, b in zip(jitted, eager):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    finally:
        config.keyswitch_shoup = old_flag
        config.use_pallas_keyswitch = old_pallas


def test_relinearize_rotate_bitexact_vs_128bit(ckks_ctx):
    ref_out, ref_rot = _relin_bytes(ckks_ctx, shoup=False)
    got_out, got_rot = _relin_bytes(ckks_ctx, shoup=True)
    for a, b in zip(got_out, ref_out):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(got_rot, ref_rot):
        np.testing.assert_array_equal(a, b)
