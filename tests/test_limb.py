"""Randomized exact-value tests of the u32 limb-pair 64-bit arithmetic,
validated against Python big-int ground truth (the same oracle the reference
tests use exact values from, tests/seal/util/uintarithsmallmod.cpp)."""

import random

import jax
import numpy as np
import pytest

from seal_tpu.ops import limb

# jit every function under test once; shapes repeat across parametrized
# moduli so each compiles a single time for the whole module.
_J = {name: jax.jit(getattr(limb, name)) for name in [
    'mul32', 'add64', 'add64c', 'sub64', 'neg64', 'mul64', 'mul64_lo',
    'mul64_hi', 'lt64', 'ge64', 'eq64', 'add_mod', 'sub_mod', 'neg_mod',
    'mul_mod', 'barrett_reduce_64', 'barrett_reduce_128', 'mul_mod_shoup',
    'mul_mod_shoup_lazy']}

random.seed(12345)

MASK64 = (1 << 64) - 1


def rand_u64(n, bits=64):
    return [random.getrandbits(bits) for _ in range(n)]


def as_pair(values):
    return limb.arr_to_u64(values)


def check(pair, expected):
    got = limb.u64_to_ints(pair)
    for g, e in zip(got.ravel(), expected):
        assert g == e & MASK64, f"{g:#x} != {e & MASK64:#x}"


N = 257  # deliberately non-aligned


def test_mul32():
    a = [random.getrandbits(32) for _ in range(N)]
    b = [random.getrandbits(32) for _ in range(N)]
    ja = np.asarray(a, dtype=np.uint32)
    jb = np.asarray(b, dtype=np.uint32)
    lo, hi = _J['mul32'](ja, jb)
    check((lo, hi), [x * y for x, y in zip(a, b)])


def test_add_sub_neg():
    a, b = rand_u64(N), rand_u64(N)
    pa, pb = as_pair(a), as_pair(b)
    check(_J['add64'](pa, pb), [(x + y) for x, y in zip(a, b)])
    check(_J['sub64'](pa, pb), [(x - y) for x, y in zip(a, b)])
    check(_J['neg64'](pa), [-x for x in a])
    s, c = _J['add64c'](pa, pb)
    carries = np.asarray(c)
    for i, (x, y) in enumerate(zip(a, b)):
        assert int(carries.ravel()[i]) == ((x + y) >> 64)


def test_shifts():
    a = rand_u64(N)
    pa = as_pair(a)
    for k in [0, 1, 5, 31, 32, 33, 63]:
        check(limb.shl64(pa, k), [x << k for x in a])
        check(limb.shr64(pa, k), [x >> k for x in a])


def test_mul64_full_lo_hi():
    a, b = rand_u64(N), rand_u64(N)
    pa, pb = as_pair(a), as_pair(b)
    p = _J['mul64'](pa, pb)
    lo = limb.u64_to_ints((p[0], p[1]))
    hi = limb.u64_to_ints((p[2], p[3]))
    for i, (x, y) in enumerate(zip(a, b)):
        full = x * y
        assert lo.ravel()[i] == full & MASK64
        assert hi.ravel()[i] == full >> 64
    check(_J['mul64_lo'](pa, pb), [x * y for x, y in zip(a, b)])
    hi2 = limb.u64_to_ints(_J['mul64_hi'](pa, pb))
    for i, (x, y) in enumerate(zip(a, b)):
        assert hi2.ravel()[i] == (x * y) >> 64


def test_comparisons():
    a, b = rand_u64(N), rand_u64(N)
    a[0] = b[0]  # force an equal pair
    pa, pb = as_pair(a), as_pair(b)
    lt = np.asarray(_J['lt64'](pa, pb)).ravel()
    ge = np.asarray(_J['ge64'](pa, pb)).ravel()
    eq = np.asarray(_J['eq64'](pa, pb)).ravel()
    for i, (x, y) in enumerate(zip(a, b)):
        assert bool(lt[i]) == (x < y)
        assert bool(ge[i]) == (x >= y)
        assert bool(eq[i]) == (x == y)


QLIST = [2, 3, 0xFC001, 0xFFFFEE001, 0x7FFFFFFFE90001, (1 << 61) - 1, 0x1FFFFFFFFFFFFFFF]


def _mod_consts(q):
    ratio = (1 << 128) // q
    return (
        limb.to_u64(q),
        limb.to_u64(ratio & MASK64),
        limb.to_u64((ratio >> 64) & MASK64),
    )


@pytest.mark.parametrize("q", QLIST)
def test_barrett_reduce_64(q):
    qq, r0, r1 = _mod_consts(q)
    xs = rand_u64(N) + [0, 1, q - 1, q, q + 1, 2 * q - 1, MASK64]
    px = as_pair(xs)
    check(_J['barrett_reduce_64'](px, qq, r1), [x % q for x in xs])


@pytest.mark.parametrize("q", QLIST)
def test_barrett_reduce_128(q):
    qq, r0, r1 = _mod_consts(q)
    lo = rand_u64(N) + [0, MASK64]
    hi = rand_u64(N) + [MASK64, MASK64]
    plo, phi = as_pair(lo), as_pair(hi)
    expected = [((h << 64) | l) % q for l, h in zip(lo, hi)]
    check(_J['barrett_reduce_128'](plo, phi, qq, r0, r1), expected)


@pytest.mark.parametrize("q", QLIST)
def test_mod_ops(q):
    qq, r0, r1 = _mod_consts(q)
    a = [x % q for x in rand_u64(N)]
    b = [x % q for x in rand_u64(N)]
    a[0], b[0] = 0, 0
    a[1], b[1] = q - 1, q - 1
    pa, pb = as_pair(a), as_pair(b)
    check(_J['add_mod'](pa, pb, qq), [(x + y) % q for x, y in zip(a, b)])
    check(_J['sub_mod'](pa, pb, qq), [(x - y) % q for x, y in zip(a, b)])
    check(_J['neg_mod'](pa, qq), [(-x) % q for x in a])
    check(_J['mul_mod'](pa, pb, qq, r0, r1), [(x * y) % q for x, y in zip(a, b)])


@pytest.mark.parametrize("q", [0xFFFFEE001, 0x7FFFFFFFE90001, (1 << 61) - 1])
def test_shoup_multiplication(q):
    qq, r0, r1 = _mod_consts(q)
    y = [x % q for x in rand_u64(N)]
    yq = [(v << 64) // q for v in y]
    x4q = [random.randrange(0, 4 * q) for _ in range(N)]  # lazy-range inputs
    px, py, pyq = as_pair(x4q), as_pair(y), as_pair(yq)
    check(_J['mul_mod_shoup'](px, py, pyq, qq), [(x * v) % q for x, v in zip(x4q, y)])
    lazy = limb.u64_to_ints(_J['mul_mod_shoup_lazy'](px, py, pyq, qq))
    for i in range(N):
        assert lazy.ravel()[i] % q == (x4q[i] * y[i]) % q
        assert lazy.ravel()[i] < 2 * q


def test_broadcasting_shapes():
    """Per-prime constants [L,1] must broadcast against [L,N] data."""
    qs = [0xFFFFEE001, 0xFFFFC4001, 0x1FFFFE0001]
    L, n = len(qs), 64
    q_pair = limb.arr_to_u64(qs, shape=(L, 1))
    r1_pair = limb.arr_to_u64([((1 << 128) // q >> 64) & MASK64 for q in qs], shape=(L, 1))
    data = [[random.getrandbits(64) for _ in range(n)] for _ in range(L)]
    pd = limb.arr_to_u64(data, shape=(L, n))
    out = limb.u64_to_ints(_J['barrett_reduce_64'](pd, q_pair, r1_pair))
    for i in range(L):
        for j in range(n):
            assert out[i][j] == data[i][j] % qs[i]
