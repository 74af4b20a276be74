"""Hybrid (alpha > 1 special primes) key switching — correctness across all
three schemes, chain levels, partial digits, rotations, and the encryptor's
key->data alpha-prime drop. Reference baseline: the alpha = 1 algorithm
(evaluator.cpp:2382-2677), which stays the bit-exact default; hybrid is the
seal_tpu extension documented in ops/hybrid_keyswitch.py."""

import numpy as np
import pytest

import seal_tpu
from seal_tpu import SchemeType, SecLevelType
from seal_tpu.modulus import CoeffModulus, PlainModulus


def _ckks_ctx(n, bits, alpha):
    parms = seal_tpu.EncryptionParameters(SchemeType.CKKS)
    parms.set_poly_modulus_degree(n)
    parms.set_coeff_modulus(CoeffModulus.create(n, bits))
    parms.set_special_modulus_size(alpha)
    parms.set_random_seed((9, 8, 7, 6, 5, 4, 3, 2))
    return seal_tpu.SEALContext(parms, sec_level=SecLevelType.NONE)


def _bfv_ctx(n, bits, alpha, scheme=SchemeType.BFV, t_bits=20):
    parms = seal_tpu.EncryptionParameters(scheme)
    parms.set_poly_modulus_degree(n)
    parms.set_coeff_modulus(CoeffModulus.create(n, bits))
    parms.set_plain_modulus(PlainModulus.batching(n, t_bits))
    parms.set_special_modulus_size(alpha)
    parms.set_random_seed((9, 8, 7, 6, 5, 4, 3, 2))
    return seal_tpu.SEALContext(parms, sec_level=SecLevelType.NONE)


def test_chain_drops_alpha_specials():
    ctx = _ckks_ctx(64, [40, 40, 40, 40, 40], alpha=2)
    assert ctx.key_context_data().coeff_modulus_size == 5
    assert ctx.first_context_data().coeff_modulus_size == 3
    assert ctx.using_keyswitching
    # data levels then drop one at a time: 3 -> 2 -> 1
    sizes = []
    cd = ctx.first_context_data()
    while cd is not None:
        sizes.append(cd.coeff_modulus_size)
        cd = cd.next_context_data
    assert sizes == [3, 2, 1]


def test_relin_key_count_is_digit_count():
    ctx = _ckks_ctx(64, [40] * 5 + [40, 40], alpha=2)   # 5 data, 2 special
    kg = seal_tpu.KeyGenerator(ctx)
    rk = kg.create_relin_keys()
    # ceil(5/2) = 3 digits, each [3, 2, 7, 64]
    assert rk.key(2)[0].shape == (3, 2, 7, 64)


@pytest.mark.parametrize("alpha,bits", [
    (2, [40, 40, 40, 40, 40]),          # 3 data, 2 special, partial digit
    (2, [40, 40, 40, 40, 40, 40]),      # 4 data, 2 special, even digits
    (3, [40, 40, 40, 40, 40, 40]),      # 3 data, 3 special, one digit
])
def test_ckks_mult_relin_rescale_rotate(alpha, bits):
    n = 128
    ctx = _ckks_ctx(n, bits, alpha)
    kg = seal_tpu.KeyGenerator(ctx)
    enc = seal_tpu.Encryptor(ctx, kg.create_public_key())
    dec = seal_tpu.Decryptor(ctx, kg.secret_key())
    ev = seal_tpu.Evaluator(ctx)
    encd = seal_tpu.CKKSEncoder(ctx)
    rk = kg.create_relin_keys()
    gk = kg.create_galois_keys()
    scale = 2.0 ** 30
    vals = np.linspace(-1, 1, encd.slot_count)
    ct = enc.encrypt(encd.encode(vals, scale))

    out = ev.rescale_to_next(ev.relinearize(ev.multiply(ct, ct), rk))
    got = encd.decode(dec.decrypt(out))
    assert np.max(np.abs(got - vals ** 2)) < 1e-4

    rot = ev.rotate_vector(ct, 1, gk)
    got = encd.decode(dec.decrypt(rot))
    assert np.max(np.abs(got - np.roll(vals, -1))) < 1e-4

    conj = ev.complex_conjugate(ct, gk)
    got = encd.decode(dec.decrypt(conj), complex_out=True)
    assert np.max(np.abs(got - vals)) < 1e-4


def test_ckks_second_level_ops():
    """Hybrid keyswitch at a LOWER chain level (digit partition restricted
    to the level's prime prefix, incl. a partial digit). Scale tracks the
    40-bit rescale primes (the standard CKKS chain discipline), so the
    noise floor stays ~2^-25 at every level."""
    ctx = _ckks_ctx(128, [50, 40, 40, 40, 50, 50], alpha=2)  # 4 data
    kg = seal_tpu.KeyGenerator(ctx)
    enc = seal_tpu.Encryptor(ctx, kg.create_public_key())
    dec = seal_tpu.Decryptor(ctx, kg.secret_key())
    ev = seal_tpu.Evaluator(ctx)
    encd = seal_tpu.CKKSEncoder(ctx)
    rk = kg.create_relin_keys()
    scale = 2.0 ** 40
    vals = np.linspace(0.1, 1, encd.slot_count)
    ct = enc.encrypt(encd.encode(vals, scale))
    sq = ev.rescale_to_next(ev.relinearize(ev.multiply(ct, ct), rk))
    # now at 3 data primes -> partial last digit {q2}
    q4 = ev.rescale_to_next(ev.relinearize(ev.multiply(sq, sq), rk))
    got = encd.decode(dec.decrypt(q4))
    assert np.max(np.abs(got - vals ** 4)) < 1e-3


@pytest.mark.parametrize("scheme", [SchemeType.BFV, SchemeType.BGV])
def test_bfv_bgv_exact_roundtrip(scheme):
    n = 64
    ctx = _bfv_ctx(n, [40, 40, 40, 40], alpha=2, scheme=scheme)
    kg = seal_tpu.KeyGenerator(ctx)
    enc = seal_tpu.Encryptor(ctx, kg.create_public_key())
    dec = seal_tpu.Decryptor(ctx, kg.secret_key())
    ev = seal_tpu.Evaluator(ctx)
    be = seal_tpu.BatchEncoder(ctx)
    rk = kg.create_relin_keys()
    gk = kg.create_galois_keys()
    vals = np.arange(n, dtype=np.uint64) % 17
    ct = enc.encrypt(be.encode(vals))

    sq = ev.relinearize(ev.multiply(ct, ct), rk)
    got = be.decode(dec.decrypt(sq))
    t = ctx.first_context_data().parms.plain_modulus.value
    np.testing.assert_array_equal(got, (vals * vals) % t)

    rot = ev.rotate_rows(ct, 1, gk)
    got = be.decode(dec.decrypt(rot))
    want = np.concatenate([np.roll(vals[:n // 2], -1), np.roll(vals[n // 2:], -1)])
    np.testing.assert_array_equal(got, want)


def test_bfv_noise_budget_positive_after_relin():
    ctx = _bfv_ctx(64, [40, 40, 40, 40], alpha=2)
    kg = seal_tpu.KeyGenerator(ctx)
    enc = seal_tpu.Encryptor(ctx, kg.create_public_key())
    dec = seal_tpu.Decryptor(ctx, kg.secret_key())
    ev = seal_tpu.Evaluator(ctx)
    rk = kg.create_relin_keys()
    pt = seal_tpu.Plaintext.from_hex_string("2x^3 + 1")
    ct = enc.encrypt(pt)
    fresh = dec.invariant_noise_budget(ct)
    sq = ev.relinearize(ev.multiply(ct, ct), rk)
    after = dec.invariant_noise_budget(sq)
    assert fresh > 0 and after > 0
    assert dec.decrypt(sq).to_hex_string() == "4x^6 + 4x^3 + 1"


def test_encrypt_at_lower_level_hybrid():
    ctx = _ckks_ctx(64, [40, 40, 40, 40, 40], alpha=2)
    kg = seal_tpu.KeyGenerator(ctx)
    enc = seal_tpu.Encryptor(ctx, kg.create_public_key(), kg.secret_key())
    dec = seal_tpu.Decryptor(ctx, kg.secret_key())
    encd = seal_tpu.CKKSEncoder(ctx)
    second = ctx.first_context_data().next_context_data
    vals = np.linspace(-2, 2, encd.slot_count)
    pt = encd.encode(vals, 2.0 ** 30, parms_id=second.parms_id)
    for asym in (True, False):
        ct = (enc.encrypt(pt) if asym else enc.encrypt_symmetric(pt))
        assert tuple(ct.parms_id) == tuple(second.parms_id)
        got = encd.decode(dec.decrypt(ct))
        assert np.max(np.abs(got - vals)) < 1e-4


def test_alpha_one_unchanged_bit_exact():
    """special_modulus_size=1 must produce byte-identical relin keys and
    keyswitch outputs to the default path (it IS the default path)."""
    n = 64
    for alpha_set in (False, True):
        parms = seal_tpu.EncryptionParameters(SchemeType.CKKS)
        parms.set_poly_modulus_degree(n)
        parms.set_coeff_modulus(CoeffModulus.create(n, [40, 40, 40]))
        if alpha_set:
            parms.set_special_modulus_size(1)
        parms.set_random_seed((1, 2, 3, 4, 5, 6, 7, 8))
        ctx = seal_tpu.SEALContext(parms, sec_level=SecLevelType.NONE)
        kg = seal_tpu.KeyGenerator(ctx)
        rk = kg.create_relin_keys()
        if not alpha_set:
            ref = np.asarray(rk.key(2)[0])
        else:
            np.testing.assert_array_equal(ref, np.asarray(rk.key(2)[0]))


def test_alpha2_halves_decompose_transform_count(monkeypatch):
    """The perf mechanism, verified statically: count actual NTT transform
    rows executed by relinearize at L=8. alpha=1 runs d·k − L = 8·9 − 8 = 64
    decompose lifts (diagonal skip included); alpha=2 runs
    ⌈L/2⌉·(L+2) = 40 — the ≈α× decompose reduction claimed in
    docs/HYBRID_KEYSWITCH.md — plus a fixed 2L-transform tail either way.
    No TPU timing needed to verify the claim's mechanism."""
    import seal_tpu.ops.ntt as ntt_mod

    counts = {}

    def counting(name, orig):
        def wrapper(x, t, lazy=False):
            counts[name] = counts.get(name, 0) + int(
                np.prod(x[0].shape[:-1], dtype=np.int64))
            return orig(x, t, lazy=lazy)
        return wrapper

    L = 8
    results = {}
    for alpha in (1, 2, 3, 4):
        bits = [30] * L + [30] * alpha
        ctx = _ckks_ctx(64, bits, alpha)
        kg = seal_tpu.KeyGenerator(ctx)
        enc = seal_tpu.Encryptor(ctx, kg.create_public_key())
        ev = seal_tpu.Evaluator(ctx)
        rk = kg.create_relin_keys()
        from seal_tpu.ckks import CKKSEncoder
        encd = CKKSEncoder(ctx)
        vals = np.linspace(-1, 1, encd.slot_count)
        ct = enc.encrypt(encd.encode(vals, 2.0 ** 25))
        cm = ev.multiply(ct, ct)

        counts.clear()
        monkeypatch.setattr(ntt_mod, "ntt_forward",
                            counting("fwd", ntt_mod.ntt_forward))
        monkeypatch.setattr(ntt_mod, "ntt_inverse",
                            counting("inv", ntt_mod.ntt_inverse))
        ev.relinearize(cm, rk)
        monkeypatch.undo()
        results[alpha] = dict(counts)

    # forward transforms = decompose lifts + the fixed 2L tail lift; the
    # diagonal skip (CKKS rows i in T_j reuse the NTT-form input) removes
    # L rows at every alpha
    tail = 2 * L
    assert results[1]["fwd"] == (L * (L + 1) - L) + tail         # 64 + 16 = 80
    assert results[2]["fwd"] == -(-L // 2) * (L + 2) - L + tail  # 32 + 16 = 48
    dec1 = results[1]["fwd"] - tail
    dec2 = results[2]["fwd"] - tail
    assert dec2 <= 0.55 * dec1                               # the ~alpha x cut
    # inverse side must not balloon to compensate (one extra special-row
    # INTT per component per extra special prime)
    assert results[2]["inv"] <= results[1]["inv"] + 2 * (2 - 1)
    # ragged alpha=3: ceil(8/3)=3 digits, last digit holds only 2 rows
    assert results[3]["fwd"] == -(-L // 3) * (L + 3) - L + tail  # 25 + 16 = 41
    assert results[3]["inv"] <= results[1]["inv"] + 2 * (3 - 1)
    # alpha=4 (the r5 fewer-transforms sweep point): 2 digits of 12 rows
    # -> decompose lifts 16, a further ~2x under alpha=2's 32 (at the cost
    # of data-scale budget — BITS_BY_ALPHA keeps the total constant)
    assert results[4]["fwd"] == -(-L // 4) * (L + 4) - L + tail  # 16 + 16 = 32
    assert results[4]["inv"] <= results[1]["inv"] + 2 * (4 - 1)


def test_pallas_keyswitch_kernel_hybrid_path():
    """The fused Pallas inner product must agree with the XLA loop when the
    decomposition axis is hybrid digits (J = ceil(L/alpha))."""
    from seal_tpu import config as cfg_mod

    ctx = _ckks_ctx(256, [40, 30, 30, 40, 40], alpha=2)
    kg = seal_tpu.KeyGenerator(ctx)
    enc = seal_tpu.Encryptor(ctx, kg.create_public_key())
    ev = seal_tpu.Evaluator(ctx)
    encd = seal_tpu.CKKSEncoder(ctx)
    rk = kg.create_relin_keys()
    ct = enc.encrypt(encd.encode([1.0, -0.5], 2.0 ** 30))

    def run():
        out = ev.relinearize(ev.multiply(ct, ct), rk)
        return [np.asarray(a) for a in out.data]

    old = cfg_mod.config.use_pallas_keyswitch
    try:
        cfg_mod.config.use_pallas_keyswitch = "never"
        want = run()
        cfg_mod.config.use_pallas_keyswitch = "always"
        got = run()
    finally:
        cfg_mod.config.use_pallas_keyswitch = old
    for w, g in zip(want, got):
        np.testing.assert_array_equal(w, g)


def test_hoisted_rotations_hybrid():
    """rotate_batch_hoisted shares ONE hybrid decomposition across steps."""
    ctx = _ckks_ctx(128, [50, 40, 40, 40, 50, 50], alpha=2)
    kg = seal_tpu.KeyGenerator(ctx)
    enc = seal_tpu.Encryptor(ctx, kg.create_public_key())
    dec = seal_tpu.Decryptor(ctx, kg.secret_key())
    ev = seal_tpu.Evaluator(ctx)
    encd = seal_tpu.CKKSEncoder(ctx)
    steps = [1, 2, 5]
    gt = ctx.key_context_data().galois_tool
    gk = kg.create_galois_keys(gt.get_elts_from_steps(steps))
    vals = np.linspace(-1, 1, encd.slot_count)
    ct = enc.encrypt(encd.encode(vals, 2.0 ** 40))
    outs = ev.rotate_batch_hoisted(ct, steps, gk)
    for s, out in zip(steps, outs):
        got = encd.decode(dec.decrypt(out))
        assert np.max(np.abs(got - np.roll(vals, -s))) < 1e-4, s


def test_multiparty_hybrid():
    """3-party common keys with digit-shaped kswitch tensors: common PK
    encrypt -> relinearize under aggregated... (multiparty flows reuse
    _generate_one_kswitch_key, so digits come for free)."""
    ctx = _bfv_ctx(64, [40, 40, 40, 40], alpha=2)
    kgs = [seal_tpu.KeyGenerator(ctx) for _ in range(3)]
    sks = [kg.generate_secret_key() for kg in kgs]
    csk = kgs[0].create_common_secret_key(sks)
    pk0 = kgs[0].create_public_key_with_sk(sks[0])
    pks = [pk0] + [kg.create_public_key_with_same_c1(sk, pk0)
                   for kg, sk in zip(kgs[1:], sks[1:])]
    cpk = kgs[0].create_common_public_key(pks)
    enc = seal_tpu.Encryptor(ctx, cpk)
    dec = seal_tpu.Decryptor(ctx, csk)
    ev = seal_tpu.Evaluator(ctx)
    pt = seal_tpu.Plaintext.from_hex_string("3x^2 + 2")
    ct = enc.encrypt(pt)
    ct2 = ev.add(ct, ct)
    # distributed decryption under the hybrid context
    partials = [seal_tpu.Decryptor(ctx, sk).distributed_decrypt(ct2, smudging_bits=8)
                for sk in sks]
    got = dec.aggregate_partial_decryption(ct2, partials)
    assert got.to_hex_string() == "6x^2 + 4"


def test_hybrid_key_serialization_roundtrip():
    """Digit-shaped relin/galois keys survive the wire format (the SEAL 4.0
    KSwitchKeys layout is shape-driven, so hybrid tensors serialize
    unchanged); valcheck accepts the digit count."""
    from seal_tpu import serialization, valcheck

    ctx = _ckks_ctx(64, [40, 40, 40, 40, 40], alpha=2)
    kg = seal_tpu.KeyGenerator(ctx)
    rk = kg.create_relin_keys()
    gk = kg.create_galois_keys([3, 5])
    rk2 = serialization.load_relin_keys(ctx, serialization.save_relin_keys(rk))
    assert valcheck.is_valid_for(rk2, ctx)
    np.testing.assert_array_equal(np.asarray(rk.key(2)[0]), np.asarray(rk2.key(2)[0]))
    gk2 = serialization.load_galois_keys(ctx, serialization.save_galois_keys(gk))
    for elt in (3, 5):
        np.testing.assert_array_equal(
            np.asarray(gk.key(elt)[0]), np.asarray(gk2.key(elt)[0]))

    # a ciphertext at the hybrid first level roundtrips too
    enc = seal_tpu.Encryptor(ctx, kg.create_public_key())
    encd = seal_tpu.CKKSEncoder(ctx)
    ct = enc.encrypt(encd.encode([1.0, 2.0], 2.0 ** 30))
    ct2 = serialization.load_ciphertext(ctx, serialization.save_ciphertext(ct))
    np.testing.assert_array_equal(np.asarray(ct.data[0]), np.asarray(ct2.data[0]))


def test_jit_evaluator_hybrid():
    """JitEvaluator's compiled-op cache works over a hybrid context."""
    ctx = _ckks_ctx(64, [40, 40, 40, 40, 40], alpha=2)
    kg = seal_tpu.KeyGenerator(ctx)
    enc = seal_tpu.Encryptor(ctx, kg.create_public_key())
    dec = seal_tpu.Decryptor(ctx, kg.secret_key())
    jev = seal_tpu.JitEvaluator(ctx)
    encd = seal_tpu.CKKSEncoder(ctx)
    rk = kg.create_relin_keys()
    vals = np.linspace(-1, 1, encd.slot_count)
    ct = enc.encrypt(encd.encode(vals, 2.0 ** 30))
    out = jev.rescale_to_next(jev.relinearize(jev.multiply(ct, ct), rk))
    out2 = jev.rescale_to_next(jev.relinearize(jev.multiply(ct, ct), rk))
    got = encd.decode(dec.decrypt(out))
    assert np.max(np.abs(got - vals ** 2)) < 1e-4
    np.testing.assert_array_equal(np.asarray(out.data[0]), np.asarray(out2.data[0]))


@pytest.mark.parametrize("alpha,nprimes", [(3, 8), (4, 8), (5, 15)])
def test_higher_alpha_relin_rescale(alpha, nprimes):
    """alpha in {3, 4, 5} GHS digits (the r5 fewer-transforms sweep parms,
    tools/bench_ops_tpu.py BITS_BY_ALPHA): non-dividing digit remainders
    (L=8, alpha=3 -> digits 3,3,2) and deep special towers must keyswitch
    correctly end to end."""
    ctx = _ckks_ctx(64, [40] * (nprimes + alpha), alpha=alpha)
    kg = seal_tpu.KeyGenerator(ctx)
    enc = seal_tpu.Encryptor(ctx, kg.create_public_key())
    dec = seal_tpu.Decryptor(ctx, kg.secret_key())
    ev = seal_tpu.Evaluator(ctx)
    encd = seal_tpu.CKKSEncoder(ctx)
    rk = kg.create_relin_keys()
    vals = np.linspace(0.1, 1, encd.slot_count)
    ct = enc.encrypt(encd.encode(vals, 2.0 ** 30))
    out = encd.decode(dec.decrypt(
        ev.rescale_to_next(ev.relinearize(ev.multiply(ct, ct), rk))))
    # toy n=64 precision floor: rescaled scale is 2^20-ish
    assert np.max(np.abs(out - vals ** 2)) < 1e-3
