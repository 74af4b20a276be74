"""Fused Pallas key-switch inner-product kernel: bit-exactness vs the XLA
formulation and vs exact Python-int arithmetic (interpret mode on CPU; the
compiled path is exercised on TPU by tools/bench_ops_tpu.py --ab-keyswitch).

Reference algebra: evaluator.cpp:2517-2547 (lazy 128-bit accumulation over
the decomposition axis, one Barrett-128 reduction)."""

import numpy as np
import pytest

import seal_tpu
from seal_tpu import config as cfg_mod
from seal_tpu.modulus import CoeffModulus
from seal_tpu.ops import keyswitch_pallas as ksp
from seal_tpu.ops import limb


def _random_case(J, I, n, seed=0):
    rng = np.random.default_rng(seed)
    moduli = [int(m) for m in CoeffModulus.create(max(n, 1024), [50] * I)]
    t = rng.integers(0, 1 << 61, size=(J, I, n), dtype=np.uint64)
    k = rng.integers(0, 1 << 61, size=(J, 2, I, n), dtype=np.uint64)
    return moduli, t, k


def _expected(moduli, t, k):
    J, I, n = t.shape
    out = np.zeros((2, I, n), dtype=np.uint64)
    ti = t.astype(object)
    ki = k.astype(object)
    for c in range(2):
        for i in range(I):
            acc = np.zeros(n, dtype=object)
            for jj in range(J):
                acc += ti[jj, i] * ki[jj, c, i]
            out[c, i] = np.array(
                [int(v) % moduli[i] for v in acc], dtype=np.uint64)
    return out


def _pairs(a):
    a = np.asarray(a, dtype=np.uint64)
    return (np.uint32(a & 0xFFFFFFFF), np.uint32(a >> np.uint64(32)))


@pytest.mark.parametrize("J,I,n", [(3, 4, 256), (1, 2, 128), (8, 9, 256)])
def test_kernel_matches_exact_ints(J, I, n):
    moduli, t, k = _random_case(J, I, n)
    lo, hi = ksp.keyswitch_inner_pallas(
        _pairs(t), _pairs(k), ksp.pack_mod_consts(moduli), interpret=True)
    got = np.asarray(lo, dtype=np.uint64) | (
        np.asarray(hi, dtype=np.uint64) << np.uint64(32))
    np.testing.assert_array_equal(got, _expected(moduli, t, k))


def test_row_tiled_blocks_bit_identical(monkeypatch):
    """The VMEM row tiling (rb < R, used at n=32768 where the full-R blocks
    exceed scoped VMEM) is exact: force tiny blocks and compare."""
    moduli, t, k = _random_case(15, 16, 1024)
    consts = ksp.pack_mod_consts(moduli)
    want = ksp.keyswitch_inner_pallas(_pairs(t), _pairs(k), consts,
                                      interpret=True)
    monkeypatch.setattr(ksp, "_KS_VMEM_BUDGET", 4096)  # rb = 8
    got = ksp.keyswitch_inner_pallas(_pairs(t), _pairs(k), consts,
                                     interpret=True)
    for w, g in zip(want, got):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))


def test_full_pipeline_pallas_equals_xla():
    """relinearize + rotate through the Pallas inner product must be
    bit-identical to the XLA loop at every chain level."""
    parms = seal_tpu.EncryptionParameters(seal_tpu.SchemeType.CKKS)
    n = 256
    parms.set_poly_modulus_degree(n)
    parms.set_coeff_modulus(CoeffModulus.create(n, [40, 30, 30, 40]))
    ctx = seal_tpu.SEALContext(parms, sec_level=seal_tpu.SecLevelType.NONE)
    kg = seal_tpu.KeyGenerator(ctx)
    pk = kg.create_public_key()
    rk = kg.create_relin_keys()
    gk = kg.create_galois_keys()
    enc = seal_tpu.Encryptor(ctx, pk)
    ev = seal_tpu.Evaluator(ctx)
    encd = seal_tpu.CKKSEncoder(ctx)
    scale = 2.0 ** 30
    pt = encd.encode([0.5, -1.25, 3.0], scale)
    ct = enc.encrypt(pt)

    def run():
        sq = ev.multiply(ct, ct)
        rl = ev.relinearize(sq, rk)
        rs = ev.rescale_to_next(rl)
        rt = ev.rotate_vector(rs, 1, gk)
        return [np.asarray(a) for a in (*rl.data, *rs.data, *rt.data)]

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
