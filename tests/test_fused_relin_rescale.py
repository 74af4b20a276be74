"""Fused relinearize + rescale (Evaluator.relinearize_rescale).

A beyond-reference CKKS fast path: the reference always runs the keyswitch
mod-down by P (evaluator.cpp:2616-2675) and then the rescale by q_last
(evaluator.cpp:1441-1479) as two separate centered divisions; seal_tpu can
merge them into ONE division by P*q_last, saving 2L forward NTT rows per
mult+relin+rescale (docs/HYBRID_KEYSWITCH.md "Fused rescale"). The fused
result is NOT bit-exact to the sequential pair (single vs double rounding)
— these tests bound the deviation against the sequential output and pin
the transform-count saving statically.
"""

import numpy as np
import pytest

import seal_tpu
from seal_tpu import SchemeType, SecLevelType
from seal_tpu.modulus import CoeffModulus, PlainModulus


def _ckks_ctx(n, bits, alpha=1):
    parms = seal_tpu.EncryptionParameters(SchemeType.CKKS)
    parms.set_poly_modulus_degree(n)
    parms.set_coeff_modulus(CoeffModulus.create(n, bits))
    parms.set_special_modulus_size(alpha)
    parms.set_random_seed((3, 1, 4, 1, 5, 9, 2, 6))
    return seal_tpu.SEALContext(parms, sec_level=SecLevelType.NONE)


def _setup(n, bits, alpha=1):
    ctx = _ckks_ctx(n, bits, alpha)
    kg = seal_tpu.KeyGenerator(ctx)
    enc = seal_tpu.Encryptor(ctx, kg.create_public_key())
    dec = seal_tpu.Decryptor(ctx, kg.secret_key())
    ev = seal_tpu.Evaluator(ctx)
    encd = seal_tpu.CKKSEncoder(ctx)
    rk = kg.create_relin_keys()
    return ctx, enc, dec, ev, encd, rk


@pytest.mark.parametrize("alpha,bits", [
    (1, [40, 40, 40, 40]),
    (2, [40, 40, 40, 40, 40]),          # 3 data, 2 special, partial digit
    (2, [40, 40, 40, 40, 40, 40]),      # 4 data, 2 special, even digits
])
def test_fused_matches_sequential_within_rounding(alpha, bits):
    n = 128
    ctx, enc, dec, ev, encd, rk = _setup(n, bits, alpha)
    scale = 2.0 ** 30
    vals = np.linspace(-1, 1, encd.slot_count)
    ct = enc.encrypt(encd.encode(vals, scale))
    cm = ev.multiply(ct, ct)

    seq = ev.rescale_to_next(ev.relinearize(cm, rk))
    fused = ev.relinearize_rescale(cm, rk)

    assert tuple(fused.parms_id) == tuple(seq.parms_id)
    assert fused.size == 2
    assert fused.scale == seq.scale
    got_seq = encd.decode(dec.decrypt(seq))
    got_fused = encd.decode(dec.decrypt(fused))
    # both decrypt to vals^2; the fused/sequential outputs differ only by
    # the single-vs-double rounding of the combined division — at most a
    # few units per coefficient, i.e. O(n/scale) per decoded slot after the
    # encoder FFT (NOT O(fresh noise)). Bound with a 8x margin on
    # (alpha+2) units across n coefficients.
    assert np.max(np.abs(got_fused - vals ** 2)) < 2e-3
    unit_bound = 8 * (alpha + 2) * n / fused.scale
    assert np.max(np.abs(got_fused - got_seq)) < unit_bound


def test_fused_chain_walk_every_level():
    """relinearize_rescale down the whole chain: x -> x^2 -> x^4."""
    ctx, enc, dec, ev, encd, rk = _setup(128, [50, 40, 40, 50], alpha=1)
    scale = 2.0 ** 40
    vals = np.linspace(-1, 1, encd.slot_count)
    ct = enc.encrypt(encd.encode(vals, scale))
    ct2 = ev.relinearize_rescale(ev.multiply(ct, ct), rk)
    ct4 = ev.relinearize_rescale(ev.multiply(ct2, ct2), rk)
    got = encd.decode(dec.decrypt(ct4))
    assert np.max(np.abs(got - vals ** 4)) < 1e-3


def test_fused_size2_equals_rescale_bit_exact():
    """A size-2 input has nothing to relinearize: the fused op must reduce
    to rescale_to_next exactly."""
    ctx, enc, dec, ev, encd, rk = _setup(64, [40, 40, 40], alpha=1)
    ct = enc.encrypt(encd.encode([1.0, -0.5], 2.0 ** 30))
    a = ev.rescale_to_next(ct)
    b = ev.relinearize_rescale(ct, rk)
    for pa, pb in zip(a.data, b.data):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))


def test_fused_size4_reduces_then_fuses():
    """size-4 input: standard switch_key steps down to size 3, then the
    fused tail — must agree with the fully sequential route."""
    ctx, enc, dec, ev, encd, _ = _setup(128, [40, 40, 40, 40], alpha=1)
    kg = seal_tpu.KeyGenerator(ctx)
    rk = kg.create_relin_keys(count=2)      # covers s^2 and s^3
    dec = seal_tpu.Decryptor(ctx, kg.secret_key())
    enc = seal_tpu.Encryptor(ctx, kg.create_public_key())
    scale = 2.0 ** 26
    vals = np.linspace(-0.5, 0.5, encd.slot_count)
    ct = enc.encrypt(encd.encode(vals, scale))
    c2 = ev.multiply(ct, ct)              # size 3
    c4 = ev.multiply(c2, ct)              # size 4, scale^3
    assert c4.size == 4
    seq = ev.rescale_to_next(ev.relinearize(c4, rk))
    fused = ev.relinearize_rescale(c4, rk)
    got_seq = encd.decode(dec.decrypt(seq))
    got_fused = encd.decode(dec.decrypt(fused))
    assert np.max(np.abs(got_fused - vals ** 3)) < 1e-3
    assert np.max(np.abs(got_fused - got_seq)) < 8 * 3 * 128 / fused.scale


def test_fused_wrong_scheme_raises():
    parms = seal_tpu.EncryptionParameters(SchemeType.BFV)
    parms.set_poly_modulus_degree(64)
    parms.set_coeff_modulus(CoeffModulus.create(64, [40, 40, 40]))
    parms.set_plain_modulus(PlainModulus.batching(64, 20))
    ctx = seal_tpu.SEALContext(parms, sec_level=SecLevelType.NONE)
    kg = seal_tpu.KeyGenerator(ctx)
    enc = seal_tpu.Encryptor(ctx, kg.create_public_key())
    ev = seal_tpu.Evaluator(ctx)
    rk = kg.create_relin_keys()
    from seal_tpu.encoders import BatchEncoder
    be = BatchEncoder(ctx)
    ct = enc.encrypt(be.encode([1, 2, 3]))
    cm = ev.multiply(ct, ct)
    with pytest.raises(ValueError, match="unsupported operation"):
        ev.relinearize_rescale(cm, rk)


def test_fused_end_of_chain_raises():
    # single data prime: the first level is already the last
    ctx, enc, dec, ev, encd, rk = _setup(64, [40, 40], alpha=1)
    ct = enc.encrypt(encd.encode([1.0], 2.0 ** 15))
    c2 = ev.multiply(ct, ct)
    with pytest.raises(ValueError, match="end of modulus switching chain"):
        ev.relinearize_rescale(c2, rk)


@pytest.mark.parametrize("alpha", [1, 2])
def test_fused_saves_2l_forward_transforms(alpha, monkeypatch):
    """The perf mechanism, verified statically (no TPU timing): the fused
    tail forward-NTTs L-1 rows per component where the sequential pair
    NTTs L (tail) + L-1 (rescale) — exactly 2L rows saved per call, with
    the inverse-side count unchanged (alpha+1 INTT rows per component both
    ways)."""
    import seal_tpu.ops.ntt as ntt_mod

    L = 6
    bits = [30] * L + [30] * alpha
    ctx, enc, dec, ev, encd, rk = _setup(64, bits, alpha)
    vals = np.linspace(-1, 1, encd.slot_count)
    ct = enc.encrypt(encd.encode(vals, 2.0 ** 25))
    cm = ev.multiply(ct, ct)

    counts = {}

    def counting(name, orig):
        def wrapper(x, t, lazy=False):
            counts[name] = counts.get(name, 0) + int(
                np.prod(x[0].shape[:-1], dtype=np.int64))
            return orig(x, t, lazy=lazy)
        return wrapper

    results = {}
    for mode in ("seq", "fused"):
        counts.clear()
        monkeypatch.setattr(ntt_mod, "ntt_forward",
                            counting("fwd", ntt_mod.ntt_forward))
        monkeypatch.setattr(ntt_mod, "ntt_inverse",
                            counting("inv", ntt_mod.ntt_inverse))
        if mode == "seq":
            ev.rescale_to_next(ev.relinearize(cm, rk))
        else:
            ev.relinearize_rescale(cm, rk)
        monkeypatch.undo()
        results[mode] = dict(counts)

    assert results["seq"]["fwd"] - results["fused"]["fwd"] == 2 * L
    assert results["seq"]["inv"] == results["fused"]["inv"]


def test_fused_under_jit_evaluator():
    """JitEvaluator must trace/cach the fused op and agree with eager
    bit-exactly (same program, one compiled call)."""
    ctx, enc, dec, ev, encd, rk = _setup(64, [40, 40, 40, 40], alpha=1)
    jev = seal_tpu.JitEvaluator(ctx)
    ct = enc.encrypt(encd.encode([0.5, -1.5], 2.0 ** 30))
    cm = ev.multiply(ct, ct)
    eager = ev.relinearize_rescale(cm, rk)
    jitted = jev.relinearize_rescale(cm, rk)
    for pa, pb in zip(eager.data, jitted.data):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
    assert jitted.scale == eager.scale
