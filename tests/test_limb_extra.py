"""Exact-value ports of the reference uintarith / uintarithsmallmod test
families that round 1 left uncovered (native/tests/seal/util/uintarith.cpp:
AddUInt128, AddUInt, SubUInt, MultiplyUInt, LeftShiftUInt128,
RightShiftUInt128, MultiplyManyUInt64; uintarithsmallmod.cpp:
MultiplyAddMod, DotProductMod) against the u32 limb-pair layer.

Every check compares the device result against exact Python big-int
arithmetic — the same oracle style as the reference's hand-written expected
values, but generated, so edge patterns (all-ones carry chains) and random
operands both run."""

import numpy as np
import pytest

from seal_tpu.ops import limb

M64 = (1 << 64) - 1
M128 = (1 << 128) - 1


def _i(pair):
    """scalar u64 pair -> Python int"""
    return int(np.asarray(pair[0])) | (int(np.asarray(pair[1])) << 32)


def _i128(quad):
    return sum(int(np.asarray(w)) << (32 * k) for k, w in enumerate(quad))


def _u128(x):
    return tuple(
        limb.to_u64((x >> (64 * k)) & M64)[j] for k in range(2) for j in range(2)
    )


EDGE64 = [0, 1, 0xFFFFFFFF, 0x100000000, M64 - 1, M64, 0x5555555555555555]


def test_add128_carry_chains():
    """AddUInt128 parity: all-ones + 1 wraps through every limb."""
    for a in [0, 1, M64, M128, M128 - 1, (M64 << 64), 0xF00F0FF0 << 60]:
        for b in [0, 1, M64, M128, (1 << 96) - 1]:
            got = _i128(limb.add128(_u128(a), _u128(b)))
            assert got == (a + b) & M128, (a, b)


def test_mul64_edges():
    for a in EDGE64:
        for b in EDGE64:
            p = limb.mul64(limb.to_u64(a), limb.to_u64(b))
            assert _i128(p) == a * b, (a, b)


def test_mul_add_128_dot_product():
    """DotProductMod-style accumulation: Σ a_i·b_i over 16 u64 pairs kept
    exactly in the 4-limb accumulator (mod 2^128)."""
    rng = np.random.default_rng(11)
    a = [int(x) for x in rng.integers(0, 1 << 62, 16, dtype=np.uint64)]
    b = [int(x) for x in rng.integers(0, 1 << 62, 16, dtype=np.uint64)]
    acc = limb.zero128(limb.to_u64(0)[0])
    for x, y in zip(a, b):
        acc = limb.mul_add_128(acc, limb.to_u64(x), limb.to_u64(y))
    assert _i128(acc) == sum(x * y for x, y in zip(a, b)) & M128


@pytest.mark.parametrize("q", [2, 10, 0xFFFF, (1 << 61) - 1, 2305843009211596801])
def test_multiply_add_mod(q):
    ratio = (1 << 128) // q
    qd = limb.to_u64(q)
    r0, r1 = limb.to_u64(ratio & M64), limb.to_u64((ratio >> 64) & M64)
    rng = np.random.default_rng(5)
    cases = [(0, 0, 0), (1, 1, 1), (q - 1, q - 1, q - 1)] + [
        tuple(int(v) % q for v in rng.integers(0, q, 3, dtype=np.uint64))
        for _ in range(8)
    ]
    for a, b, c in cases:
        got = _i(limb.multiply_add_mod(
            limb.to_u64(a), limb.to_u64(b), limb.to_u64(c), qd, r0, r1))
        assert got == (a * b + c) % q, (a, b, c, q)


@pytest.mark.parametrize("q", [10, (1 << 61) - 1, 2305843009211596801])
def test_multiply_add_mod_shoup(q):
    rng = np.random.default_rng(6)
    qd = limb.to_u64(q)
    for _ in range(8):
        a, y, c = (int(v) % q for v in rng.integers(0, q, 3, dtype=np.uint64))
        y_quot = (y << 64) // q
        got = _i(limb.multiply_add_mod_shoup(
            limb.to_u64(a), limb.to_u64(y), limb.to_u64(y_quot),
            limb.to_u64(c), qd))
        assert got == (a * y + c) % q


def test_shl_shr_across_word_boundaries():
    """LeftShiftUInt128 / RightShiftUInt128 parity at every shift class."""
    vals = [1, 0x8000000000000000, 0x123456789ABCDEF0, M64]
    for v in vals:
        for k in [0, 1, 31, 32, 33, 63]:
            assert _i(limb.shl64(limb.to_u64(v), k)) == (v << k) & M64, (v, k)
            assert _i(limb.shr64(limb.to_u64(v), k)) == v >> k, (v, k)


def _limbs(x, n):
    return tuple(limb.to_u64((x >> (32 * k)) & 0xFFFFFFFF)[0] for k in range(n))


def _limbs_to_int(t):
    return sum(int(np.asarray(w)) << (32 * k) for k, w in enumerate(t))


def test_add_limbs_multiword():
    """AddUInt parity: carry propagates across arbitrary widths."""
    rng = np.random.default_rng(3)
    for bits in (96, 192, 288):
        n = bits // 32
        mask = (1 << bits) - 1
        for a, b in [(mask, 1), (mask, mask), (0, 0)] + [
            (int.from_bytes(rng.bytes(bits // 8), "little"),
             int.from_bytes(rng.bytes(bits // 8), "little"))
            for _ in range(4)
        ]:
            got = _limbs_to_int(limb.add_limbs(_limbs(a, n), _limbs(b, n)))
            assert got == (a + b) & mask, (a, b, bits)


def test_sub_limbs_multiword():
    rng = np.random.default_rng(4)
    n, bits = 6, 192
    for _ in range(6):
        a = int.from_bytes(rng.bytes(24), "little")
        b = int.from_bytes(rng.bytes(24), "little")
        a, b = max(a, b), min(a, b)
        got = _limbs_to_int(limb.sub_limbs(_limbs(a, n), _limbs(b, n)))
        assert got == a - b


def test_mul_limbs_multiword():
    """MultiplyUInt parity: schoolbook product widens to len(a)+len(b)."""
    rng = np.random.default_rng(9)
    for ba, bb in [(64, 64), (96, 160), (192, 64)]:
        na, nb = ba // 32, bb // 32
        for _ in range(4):
            a = int.from_bytes(rng.bytes(ba // 8), "little")
            b = int.from_bytes(rng.bytes(bb // 8), "little")
            got = _limbs_to_int(limb.mul_limbs(_limbs(a, na), _limbs(b, nb)))
            assert got == a * b, (a, b)


def test_ge_select_limbs():
    rng = np.random.default_rng(2)
    n = 4
    pairs = [(0, 0), (1, 0), ((1 << 128) - 1, (1 << 128) - 2)] + [
        (int.from_bytes(rng.bytes(16), "little"),
         int.from_bytes(rng.bytes(16), "little"))
        for _ in range(5)
    ]
    for a, b in pairs:
        ge = bool(np.asarray(limb.ge_limbs(_limbs(a, n), _limbs(b, n))))
        assert ge == (a >= b), (a, b)
        sel = limb.select_limbs(
            limb.ge_limbs(_limbs(a, n), _limbs(b, n)),
            _limbs(a, n), _limbs(b, n))
        assert _limbs_to_int(sel) == max(a, b)


def test_multiply_many_host():
    """MultiplyManyUInt64 parity (host path, utils.numth.multiply_many)."""
    from seal_tpu.utils.numth import multiply_many

    assert multiply_many([]) == 1
    assert multiply_many([7]) == 7
    vals = [0xFFFFFFFFFFFFFFFF, 3, (1 << 61) - 1, 12345]
    want = 1
    for v in vals:
        want *= v
    assert multiply_many(vals) == want
