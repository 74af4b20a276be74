"""Pallas fused-NTT kernel vs the XLA reference implementation
(interpret mode on CPU; the compiled path is exercised on TPU by
tools/bench_ntt_tpu.py)."""

import random

import pytest

from seal_tpu.modulus import CoeffModulus
from seal_tpu.ops import limb
from seal_tpu.ops import ntt as ntt_mod
from seal_tpu.ops import ntt_pallas as npk

random.seed(11)


@pytest.mark.parametrize("log_n", [6, 8, 10, 11, 12])
def test_pallas_matches_reference(log_n):
    n = 1 << log_n
    qs = [int(m) for m in CoeffModulus.create(n, [30, 45])]
    ref_t = ntt_mod.build_device_tables(log_n, qs)
    pt = npk.build_pallas_tables(log_n, qs)
    vals = [[random.randrange(q) for _ in range(n)] for q in qs]
    x = limb.arr_to_u64(vals, shape=(len(qs), n))

    fwd_ref = limb.u64_to_ints(ntt_mod.ntt_forward(x, ref_t))
    fwd_got = limb.u64_to_ints(npk.ntt_forward_pallas(x, pt, interpret=True))
    for i in range(len(qs)):
        assert list(fwd_got[i]) == list(fwd_ref[i])

    y = ntt_mod.ntt_forward(x, ref_t)
    inv_ref = limb.u64_to_ints(ntt_mod.ntt_inverse(y, ref_t))
    inv_got = limb.u64_to_ints(npk.ntt_inverse_pallas(y, pt, interpret=True))
    for i in range(len(qs)):
        assert list(inv_got[i]) == list(inv_ref[i])


def test_pallas_batched_and_lazy():
    log_n, n = 7, 128
    qs = [int(m) for m in CoeffModulus.create(n, [40])]
    ref_t = ntt_mod.build_device_tables(log_n, qs)
    pt = npk.build_pallas_tables(log_n, qs)
    vals = [[[random.randrange(qs[0]) for _ in range(n)]] for _ in range(3)]
    x = limb.arr_to_u64(vals, shape=(3, 1, n))
    ref = limb.u64_to_ints(ntt_mod.ntt_forward(x, ref_t))
    got = limb.u64_to_ints(npk.ntt_forward_pallas(x, pt, interpret=True))
    for b in range(3):
        assert list(got[b][0]) == list(ref[b][0])
    # lazy output differs in range but agrees mod q
    lazy = limb.u64_to_ints(npk.ntt_forward_pallas(x, pt, lazy=True, interpret=True))
    q = qs[0]
    for b in range(3):
        for a, r in zip(lazy[b][0], ref[b][0]):
            assert a < 4 * q and a % q == r


@pytest.mark.parametrize(
    "sub,lane,lane_t",
    [
        (False, False, False),   # pure roll+select (the measured-fastest default)
        (True, False, False),    # sublane compaction only
        (False, True, False),    # legacy in-lane split only
        (True, True, False),     # both legacy compactions
        (False, False, True),    # transposed lane compaction only
        (True, False, True),     # sublane + transposed lane
    ])
def test_pallas_pair_compaction_modes(monkeypatch, sub, lane, lane_t):
    """Paired-butterfly compaction: every flag combination is bit-identical
    to the XLA reference — roll+select (the default; measured fastest on
    v5e 2026-08-19, see ops/ntt_pallas.py flag notes), the sublane split,
    the legacy in-lane split (rejected by the 2026-08 Mosaic toolchain but
    kept for others), and the r3 transposed lane formulation. log_n=11
    exercises row gaps 8/4/2/1 (tile-aligned and sub-tile) and every lane
    gap."""
    monkeypatch.setattr(npk, "_PAIR_COMPACT_SUBLANE", sub)
    monkeypatch.setattr(npk, "_PAIR_COMPACT_LANE", lane)
    monkeypatch.setattr(npk, "_PAIR_COMPACT_LANE_T", lane_t)
    log_n = 11
    n = 1 << log_n
    qs = [int(m) for m in CoeffModulus.create(n, [30, 45])]
    ref_t = ntt_mod.build_device_tables(log_n, qs)
    pt = npk.build_pallas_tables(log_n, qs)
    vals = [[random.randrange(q) for _ in range(n)] for q in qs]
    x = limb.arr_to_u64(vals, shape=(len(qs), n))

    fwd_ref = limb.u64_to_ints(ntt_mod.ntt_forward(x, ref_t))
    fwd_got = limb.u64_to_ints(npk.ntt_forward_pallas(x, pt, interpret=True))
    for i in range(len(qs)):
        assert list(fwd_got[i]) == list(fwd_ref[i])

    y = ntt_mod.ntt_forward(x, ref_t)
    inv_ref = limb.u64_to_ints(ntt_mod.ntt_inverse(y, ref_t))
    inv_got = limb.u64_to_ints(npk.ntt_inverse_pallas(y, pt, interpret=True))
    for i in range(len(qs)):
        assert list(inv_got[i]) == list(inv_ref[i])


@pytest.mark.parametrize("log_n", [6, 8, 10])
def test_pallas_compact_matches_reference(log_n):
    """Compact per-stage tables + MXU one-hot expansion (r2): bit-identical
    to the XLA reference. (Kept as an option; the expanded-table kernel
    measured faster on v5e and remains the default — BASELINE.md r2.)"""
    n = 1 << log_n
    qs = [int(m) for m in CoeffModulus.create(n, [30, 45])]
    ref_t = ntt_mod.build_device_tables(log_n, qs)
    pt = npk.build_pallas_tables_compact(log_n, qs)
    vals = [[random.randrange(q) for _ in range(n)] for q in qs]
    x = limb.arr_to_u64(vals, shape=(len(qs), n))

    fwd_ref = limb.u64_to_ints(ntt_mod.ntt_forward(x, ref_t))
    fwd_got = limb.u64_to_ints(npk.ntt_forward_pallas(x, pt, interpret=True))
    for i in range(len(qs)):
        assert list(fwd_got[i]) == list(fwd_ref[i])

    y = ntt_mod.ntt_forward(x, ref_t)
    inv_ref = limb.u64_to_ints(ntt_mod.ntt_inverse(y, ref_t))
    inv_got = limb.u64_to_ints(npk.ntt_inverse_pallas(y, pt, interpret=True))
    for i in range(len(qs)):
        assert list(inv_got[i]) == list(inv_ref[i])


def test_galois_matmul_route_matches_gather():
    """Clos-routed MXU permutation (r2 option): bit-identical to the gather
    path for several Galois elements (measured at speed parity on v5e —
    BASELINE.md r2; kept as config.galois_permute='matmul')."""
    import numpy as np
    from seal_tpu.config import config
    from seal_tpu.ops.galois import GaloisTool

    gt = GaloisTool(11)  # n=2048
    rng = np.random.default_rng(2)
    vals = [[int(v) for v in rng.integers(0, (1 << 50), size=2048)]
            for _ in range(2)]
    x = limb.arr_to_u64(vals, shape=(2, 2048))
    for elt in (3, 9, 4095):
        got = gt.apply_galois_ntt_matmul(x, elt)
        tab = gt._ntt_table(elt)
        ref = (x[0][..., tab], x[1][..., tab])
        assert np.array_equal(np.asarray(got[0]), np.asarray(ref[0])), elt
        assert np.array_equal(np.asarray(got[1]), np.asarray(ref[1])), elt


def test_pallas_multipass_split_bit_identical(monkeypatch):
    """The stage-range VMEM paging (n=32768's path) must be bit-transparent:
    shrink the per-pass table budget so even n=1024 splits into 3+ passes
    and compare against the single-pass XLA reference, incl. lazy outputs."""
    log_n = 10
    n = 1 << log_n
    qs = [int(m) for m in CoeffModulus.create(n, [30, 45])]
    ref_t = ntt_mod.build_device_tables(log_n, qs)
    pt = npk.build_pallas_tables(log_n, qs)
    vals = [[random.randrange(q) for _ in range(n)] for q in qs]
    x = limb.arr_to_u64(vals, shape=(len(qs), n))

    # 16n bytes/stage; 4 stages per pass -> 3 passes at log_n=10
    monkeypatch.setattr(npk, "_PASS_TABLE_BYTES", 16 * n * 4)

    fwd_ref = limb.u64_to_ints(ntt_mod.ntt_forward(x, ref_t))
    fwd_got = limb.u64_to_ints(npk.ntt_forward_pallas(x, pt, interpret=True))
    for i in range(len(qs)):
        assert list(fwd_got[i]) == list(fwd_ref[i])

    y = ntt_mod.ntt_forward(x, ref_t)
    inv_ref = limb.u64_to_ints(ntt_mod.ntt_inverse(y, ref_t))
    inv_got = limb.u64_to_ints(npk.ntt_inverse_pallas(y, pt, interpret=True))
    for i in range(len(qs)):
        assert list(inv_got[i]) == list(inv_ref[i])

    # lazy forward keeps the [0,4q) range across pass boundaries
    lz_ref = limb.u64_to_ints(ntt_mod.ntt_forward(x, ref_t, lazy=True))
    lz_got = limb.u64_to_ints(
        npk.ntt_forward_pallas(x, pt, lazy=True, interpret=True))
    for i, q in enumerate(qs):
        for a, b in zip(lz_got[i], lz_ref[i]):
            assert a % q == b % q
            assert a < 4 * q
