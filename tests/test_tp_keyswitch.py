"""shard_map tensor-parallel keyswitch: bit-identity with the single-chip
Evaluator (SURVEY §2.11 TP row; parity: evaluator.cpp:2382-2677).

The decomposition axis is sharded over 'tp'; the contraction is ONE exact
psum of 21-bit limb splits (parallel/keyswitch.py). Kept deliberately small
(n=64, one compile per scheme) so the suite stays fast — the driver's
dryrun_multichip exercises the same path inside the full sharded pipeline.
"""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from seal_tpu import (
    CoeffModulus,
    EncryptionParameters,
    Encryptor,
    Evaluator,
    KeyGenerator,
    SEALContext,
    SchemeType,
    SecLevelType,
)
from seal_tpu.ckks import CKKSEncoder
from seal_tpu.dtypes import Plaintext
from seal_tpu.parallel.keyswitch import TPEvaluator, tp_relinearize

SEED = (1, 2, 3, 4, 5, 6, 7, 8)


def _mesh(tp: int) -> Mesh:
    devs = jax.devices()
    if len(devs) < tp:
        pytest.skip(f"needs {tp} devices")
    return Mesh(np.asarray(devs[:tp]).reshape(1, tp), ("dp", "tp"))


def test_ckks_tp_relinearize_bit_identical():
    """Synthetic size-3 NTT-form ciphertext through the tp=4 shard_map
    keyswitch vs the stock Evaluator — bit-identical (the driver's
    dryrun_multichip runs the same path after a REAL CKKS multiply)."""
    from seal_tpu.dtypes import Ciphertext, to_device

    parms = EncryptionParameters(SchemeType.CKKS)
    parms.set_poly_modulus_degree(64)
    parms.set_coeff_modulus(CoeffModulus.create(64, [40] * 5))
    parms.set_random_seed(SEED)
    ctx = SEALContext(parms, sec_level=SecLevelType.NONE)
    kg = KeyGenerator(ctx)
    rk = kg.create_relin_keys()
    ev = Evaluator(ctx)
    cd = ctx.first_context_data()
    moduli = cd.key_moduli()
    rng = np.random.default_rng(4)
    rows = np.stack([
        np.stack([rng.integers(0, q, size=64, dtype=np.uint64) for q in moduli])
        for _ in range(3)
    ])
    cm = Ciphertext(to_device(rows), parms_id=tuple(ctx.first_parms_id),
                    is_ntt_form=True, scale=2.0 ** 60)
    ref = ev.relinearize(cm, rk)
    got = tp_relinearize(ev, cm, rk, _mesh(4))
    assert np.array_equal(ref.to_numpy(), got.to_numpy())


def test_bfv_tp_relinearize_bit_identical():
    """Relinearize is a pure function of (ct, keys): a synthetic size-3
    ciphertext exercises the TP keyswitch without paying for an eager BEHZ
    multiply on the virtual mesh."""
    from seal_tpu.dtypes import Ciphertext, to_device

    parms = EncryptionParameters(SchemeType.BFV)
    parms.set_poly_modulus_degree(64)
    parms.set_coeff_modulus(CoeffModulus.create(64, [40, 40, 40]))
    parms.set_plain_modulus(257)
    parms.set_random_seed(SEED)
    ctx = SEALContext(parms, sec_level=SecLevelType.NONE)
    kg = KeyGenerator(ctx)
    rk = kg.create_relin_keys()
    ev = Evaluator(ctx)
    cd = ctx.first_context_data()
    moduli = cd.key_moduli()
    rng = np.random.default_rng(3)
    rows = np.stack([
        np.stack([rng.integers(0, q, size=64, dtype=np.uint64) for q in moduli])
        for _ in range(3)
    ])
    cm = Ciphertext(to_device(rows), parms_id=tuple(ctx.first_parms_id))
    ref = ev.relinearize(cm, rk)
    got = tp_relinearize(ev, cm, rk, _mesh(2))
    assert np.array_equal(ref.to_numpy(), got.to_numpy())


def test_tp_evaluator_ckks_pipeline_bit_identical():
    """The user-facing TPEvaluator: a REAL CKKS multiply -> relinearize ->
    rescale -> rotate -> conjugate pipeline where every key switch runs the
    shard_map TP contraction, bit-compared op by op against the stock
    Evaluator (parity: evaluator.cpp:1104-1159, 2221-2323)."""
    parms = EncryptionParameters(SchemeType.CKKS)
    parms.set_poly_modulus_degree(64)
    parms.set_coeff_modulus(CoeffModulus.create(64, [40] * 5))
    parms.set_random_seed(SEED)
    ctx = SEALContext(parms, sec_level=SecLevelType.NONE)
    kg = KeyGenerator(ctx)
    pk = kg.create_public_key()
    rk = kg.create_relin_keys()
    gt = ctx.key_context_data().galois_tool
    gk = kg.create_galois_keys(
        [gt.get_elt_from_step(1), gt.get_elt_from_step(0)])
    enc = Encryptor(ctx, pk)
    encoder = CKKSEncoder(ctx)
    ev = Evaluator(ctx)
    tev = TPEvaluator(ctx, _mesh(2))

    scale = 2.0 ** 30
    vals = np.linspace(-1, 1, encoder.slot_count)
    ct1 = enc.encrypt(encoder.encode(vals, scale))
    ct2 = enc.encrypt(encoder.encode(vals + 0.5, scale))

    ref = ev.rescale_to_next(ev.relinearize(ev.multiply(ct1, ct2), rk))
    got = tev.rescale_to_next(tev.relinearize(tev.multiply(ct1, ct2), rk))
    assert np.array_equal(ref.to_numpy(), got.to_numpy())

    # L=3 after rescale: not divisible by tp=2 -> the r3 zero-padding keeps
    # the level sharded (d_pad=4) instead of the old single-chip fallback
    tks = tev._tks_for(got.parms_id)
    assert tks is not None and tks.L == 3 and tks.d_pad == 4
    r_ref = ev.rotate_vector(ref, 1, gk)
    r_got = tev.rotate_vector(got, 1, gk)
    assert np.array_equal(r_ref.to_numpy(), r_got.to_numpy())

    # conjugate at the top level exercises the sharded galois keyswitch
    c_ref = ev.complex_conjugate(ct1, gk)
    c_got = tev.complex_conjugate(ct1, gk)
    assert np.array_equal(c_ref.to_numpy(), c_got.to_numpy())


def test_tp_evaluator_bfv_rotate_bit_identical():
    """BFV row rotation through TPEvaluator (coeff-domain galois + TP
    keyswitch) == stock Evaluator."""
    parms = EncryptionParameters(SchemeType.BFV)
    parms.set_poly_modulus_degree(64)
    parms.set_coeff_modulus(CoeffModulus.create(64, [40, 40, 40]))
    parms.set_plain_modulus(257)
    parms.set_random_seed(SEED)
    ctx = SEALContext(parms, sec_level=SecLevelType.NONE)
    kg = KeyGenerator(ctx)
    pk = kg.create_public_key()
    gt = ctx.key_context_data().galois_tool
    gk = kg.create_galois_keys([gt.get_elt_from_step(1)])
    enc = Encryptor(ctx, pk)
    ev = Evaluator(ctx)
    tev = TPEvaluator(ctx, _mesh(2))

    ct = enc.encrypt(Plaintext.from_hex_string("5x^3 + 2x^1 + 3"))
    ref = ev.rotate_rows(ct, 1, gk)
    got = tev.rotate_rows(ct, 1, gk)
    assert np.array_equal(ref.to_numpy(), got.to_numpy())


def test_hybrid_tp_relinearize_bit_identical():
    """HYBRID digits sharded over tp=2: mult -> TPEvaluator.relinearize must
    equal the single-chip hybrid Evaluator bit-for-bit (digit-axis shard,
    replicated coeff target, same single psum)."""
    mesh = _mesh(2)
    parms = EncryptionParameters(SchemeType.CKKS)
    parms.set_poly_modulus_degree(64)
    parms.set_coeff_modulus(CoeffModulus.create(64, [40] * 4 + [40, 40]))
    parms.set_special_modulus_size(2)        # 4 data primes -> 2 digits
    parms.set_random_seed(SEED)
    ctx = SEALContext(parms, sec_level=SecLevelType.NONE)
    kg = KeyGenerator(ctx)
    rk = kg.create_relin_keys()
    enc = Encryptor(ctx, kg.create_public_key())
    encd = CKKSEncoder(ctx)
    ev = Evaluator(ctx)
    tev = TPEvaluator(ctx, mesh)
    ct = enc.encrypt(encd.encode(np.linspace(-1, 1, 32), 2.0 ** 30))
    cm = ev.multiply(ct, ct)
    want = ev.relinearize(cm, rk)
    with mesh:
        got = tev.relinearize(cm, rk)
    np.testing.assert_array_equal(np.asarray(want.data[0]), np.asarray(got.data[0]))
    np.testing.assert_array_equal(np.asarray(want.data[1]), np.asarray(got.data[1]))
    # and it decrypts correctly
    dec = __import__("seal_tpu").Decryptor(ctx, kg.secret_key())
    out = ev.rescale_to_next(got)
    vals = encd.decode(dec.decrypt(out))
    assert np.max(np.abs(vals - np.linspace(-1, 1, 32) ** 2)) < 1e-4


def test_tp_fused_relinearize_rescale_bit_identical():
    """The FUSED relinearize+rescale under TPEvaluator: the _switch_key_prod
    override shards the contraction, the fused P*q_last tail runs unchanged —
    output must be bit-identical to the single-chip fused Evaluator (the
    fused op is deterministic; sharding must not change it)."""
    mesh = _mesh(2)
    parms = EncryptionParameters(SchemeType.CKKS)
    parms.set_poly_modulus_degree(64)
    parms.set_coeff_modulus(CoeffModulus.create(64, [40] * 4 + [40, 40]))
    parms.set_special_modulus_size(2)        # 4 data primes -> 2 digits
    parms.set_random_seed(SEED)
    ctx = SEALContext(parms, sec_level=SecLevelType.NONE)
    kg = KeyGenerator(ctx)
    rk = kg.create_relin_keys()
    enc = Encryptor(ctx, kg.create_public_key())
    encd = CKKSEncoder(ctx)
    ev = Evaluator(ctx)
    tev = TPEvaluator(ctx, mesh)
    base = np.linspace(-1, 1, 32)
    ct = enc.encrypt(encd.encode(base, 2.0 ** 30))
    cm = ev.multiply(ct, ct)
    want = ev.relinearize_rescale(cm, rk)
    with mesh:
        got = tev.relinearize_rescale(cm, rk)
    assert tuple(got.parms_id) == tuple(want.parms_id)
    assert got.scale == want.scale
    np.testing.assert_array_equal(np.asarray(want.data[0]), np.asarray(got.data[0]))
    np.testing.assert_array_equal(np.asarray(want.data[1]), np.asarray(got.data[1]))
    dec = __import__("seal_tpu").Decryptor(ctx, kg.secret_key())
    vals = encd.decode(dec.decrypt(got))
    assert np.max(np.abs(vals - base ** 2)) < 1e-4


def test_tp_every_chain_level():
    """VERDICT r2 item 4: a depth-3 CKKS pipeline through TPEvaluator with
    tp=4 must keep the TP contraction at EVERY level — including levels
    whose tower count does not divide the mesh (L=5, 4, 3 here; 5 and 3
    need the zero-padding path) — with exactly one psum per keyswitch and
    outputs bit-identical to the stock Evaluator."""
    mesh = _mesh(4)
    parms = EncryptionParameters(SchemeType.CKKS)
    parms.set_poly_modulus_degree(64)
    parms.set_coeff_modulus(CoeffModulus.create(64, [40] * 6))
    parms.set_random_seed(SEED)
    ctx = SEALContext(parms, sec_level=SecLevelType.NONE)
    kg = KeyGenerator(ctx)
    pk = kg.create_public_key()
    rk = kg.create_relin_keys()
    enc = Encryptor(ctx, pk)
    encd = CKKSEncoder(ctx)
    scale = 2.0 ** 16
    v = np.linspace(-1, 1, encd.slot_count)
    ct0 = enc.encrypt(encd.encode(v, scale))

    # census: count psum calls traced per TP contraction
    import seal_tpu.parallel.keyswitch as ksmod

    psum_calls = []
    real_psum = jax.lax.psum

    def counting_psum(x, axis_name, **kw):
        psum_calls.append(axis_name)
        return real_psum(x, axis_name, **kw)

    def pipeline(evaluator):
        ct = ct0
        outs = []
        for _ in range(3):
            ct = evaluator.rescale_to_next(
                evaluator.relinearize(evaluator.multiply(ct, ct), rk))
            outs.append(ct)
        return outs

    ref = pipeline(Evaluator(ctx))

    tpe = TPEvaluator(ctx, mesh)
    old = jax.lax.psum
    jax.lax.psum = counting_psum
    ksmod.jax.lax.psum = counting_psum
    try:
        got = pipeline(tpe)
    finally:
        jax.lax.psum = old
        ksmod.jax.lax.psum = old

    # depth 3 at L=5, 4, 3: L=4 divides tp=4; L=5 and L=3 exercise padding.
    # One psum traced per level's first compile.
    assert len(psum_calls) == 3, psum_calls
    # no level fell back to the single-chip path
    assert all(t is not None and t.d_pad % 4 == 0
               for t in tpe._tks_cache.values())
    assert {t.L for t in tpe._tks_cache.values()} == {5, 4, 3}
    for a, b in zip(ref, got):
        for x, y in zip(a.data, b.data):
            assert np.array_equal(np.asarray(x), np.asarray(y))
        assert a.scale == b.scale


@pytest.mark.parametrize("alpha", [1, 2])
def test_tp_hoisted_rotation_batch(alpha):
    """VERDICT r3 item 2 / BASELINE config #4: a hoisted rotation batch
    through TPEvaluator must stay sharded — one shared sharded decompose,
    k digit-sharded contractions, exactly ONE psum for the whole batch —
    and be bit-identical to the single-chip rotate_batch_hoisted, at the
    first level AND at a rescaled level (zero-padding path), for both the
    per-prime (alpha=1) and hybrid (alpha=2) decompositions."""
    mesh = _mesh(4)
    parms = EncryptionParameters(SchemeType.CKKS)
    parms.set_poly_modulus_degree(64)
    parms.set_coeff_modulus(CoeffModulus.create(64, [40] * 6))
    if alpha > 1:
        parms.set_special_modulus_size(alpha)
    parms.set_random_seed(SEED)
    ctx = SEALContext(parms, sec_level=SecLevelType.NONE)
    kg = KeyGenerator(ctx)
    pk = kg.create_public_key()
    rk = kg.create_relin_keys()
    gt = ctx.key_context_data().galois_tool
    steps = [1, 2, -1]
    gk = kg.create_galois_keys(gt.get_elts_from_steps(steps))
    enc = Encryptor(ctx, pk)
    encd = CKKSEncoder(ctx)
    scale = 2.0 ** 16
    v = np.linspace(-1, 1, encd.slot_count)
    ct0 = enc.encrypt(encd.encode(v, scale))
    ev = Evaluator(ctx)
    # a rescaled level exercises the decomposition-axis padding
    ct1 = ev.rescale_to_next(ev.relinearize(ev.multiply(ct0, ct0), rk))

    import seal_tpu.parallel.keyswitch as ksmod

    psum_calls = []
    real_psum = jax.lax.psum

    def counting_psum(x, axis_name, **kw):
        psum_calls.append(axis_name)
        return real_psum(x, axis_name, **kw)

    tpe = TPEvaluator(ctx, mesh)
    for ct in (ct0, ct1):
        ref = ev.rotate_batch_hoisted(ct, steps, gk)
        psum_calls.clear()
        old = jax.lax.psum
        jax.lax.psum = counting_psum
        ksmod.jax.lax.psum = counting_psum
        try:
            got = tpe.rotate_batch_hoisted(ct, steps, gk)
        finally:
            jax.lax.psum = old
            ksmod.jax.lax.psum = old
        # ONE collective traced for the whole 3-rotation batch
        assert len(psum_calls) == 1, psum_calls
        for a, b in zip(ref, got):
            for x, y in zip(a.data, b.data):
                assert np.array_equal(np.asarray(x), np.asarray(y))


def test_tp_hoisted_rotation_batch_bfv():
    """BFV leg of the TP-sharded hoisted batch (no CKKS eye substitution
    in the sharded decompose body): bit-identical to single-chip."""
    mesh = _mesh(4)
    parms = EncryptionParameters(SchemeType.BFV)
    parms.set_poly_modulus_degree(64)
    parms.set_coeff_modulus(CoeffModulus.create(64, [40] * 5))
    parms.set_plain_modulus(257)
    parms.set_random_seed(SEED)
    ctx = SEALContext(parms, sec_level=SecLevelType.NONE)
    kg = KeyGenerator(ctx)
    pk = kg.create_public_key()
    gt = ctx.key_context_data().galois_tool
    steps = [1, -1]
    gk = kg.create_galois_keys(gt.get_elts_from_steps(steps))
    from seal_tpu import BatchEncoder

    be = BatchEncoder(ctx)
    enc = Encryptor(ctx, pk)
    ct = enc.encrypt(be.encode(np.arange(64, dtype=np.uint64) % 257))
    ev = Evaluator(ctx)
    tpe = TPEvaluator(ctx, mesh)
    ref = ev.rotate_batch_hoisted(ct, steps, gk)
    got = tpe.rotate_batch_hoisted(ct, steps, gk)
    for a, b in zip(ref, got):
        for x, y in zip(a.data, b.data):
            assert np.array_equal(np.asarray(x), np.asarray(y))


def test_tp8_relinearize_and_hoisted():
    """tp=8 across all virtual devices (mesh-width diversity beyond the
    tp=4 suite): relinearize and a hoisted batch, bit-identical."""
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 devices")
    mesh = Mesh(np.asarray(devs[:8]).reshape(1, 8), ("dp", "tp"))
    parms = EncryptionParameters(SchemeType.CKKS)
    parms.set_poly_modulus_degree(64)
    parms.set_coeff_modulus(CoeffModulus.create(64, [30] * 9))
    parms.set_random_seed(SEED)
    ctx = SEALContext(parms, sec_level=SecLevelType.NONE)
    kg = KeyGenerator(ctx)
    pk = kg.create_public_key()
    rk = kg.create_relin_keys()
    gt = ctx.key_context_data().galois_tool
    gk = kg.create_galois_keys(gt.get_elts_from_steps([1, 2]))
    enc = Encryptor(ctx, pk)
    encd = CKKSEncoder(ctx)
    ct = enc.encrypt(encd.encode(np.linspace(-1, 1, 32), 2.0 ** 14))
    ev = Evaluator(ctx)
    tpe = TPEvaluator(ctx, mesh)
    cm = ev.multiply(ct, ct)
    ref = ev.relinearize(cm, rk)
    got = tpe.relinearize(cm, rk)
    assert np.array_equal(ref.to_numpy(), got.to_numpy())
    ref_r = ev.rotate_batch_hoisted(ct, [1, 2], gk)
    got_r = tpe.rotate_batch_hoisted(ct, [1, 2], gk)
    for a, b in zip(ref_r, got_r):
        for x, y in zip(a.data, b.data):
            assert np.array_equal(np.asarray(x), np.asarray(y))
