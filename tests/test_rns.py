"""RNS layer tests. Golden values mirror the reference suite
(/root/reference/native/tests/seal/util/rns.cpp) — the primary bit-exactness
oracle for the rebuild (SURVEY.md §4)."""

import random

import jax
import numpy as np
import pytest

from seal_tpu.ops import limb
from seal_tpu.ops import rns as R
from seal_tpu.ops import ntt as ntt_mod

random.seed(42)


def pair_of(rows, shape):
    return limb.arr_to_u64(rows, shape=shape)


def ints_of(pair):
    return limb.u64_to_ints(pair)


# ---------------------------------------------------------------------------
# RNSBase
# ---------------------------------------------------------------------------

def test_rnsbase_create():
    R.RNSBase([2])
    R.RNSBase([2, 3])
    R.RNSBase([3, 5, 7, 11])
    with pytest.raises(ValueError):
        R.RNSBase([])
    with pytest.raises(ValueError):
        R.RNSBase([2, 4])  # not coprime
    with pytest.raises(ValueError):
        R.RNSBase([0])


def test_rnsbase_extend_drop():
    b = R.RNSBase([3, 5])
    b2 = b.extend(7)
    assert b2.base == [3, 5, 7]
    assert b2.drop().base == [3, 5]
    assert b2.drop(5).base == [3, 7]
    with pytest.raises(ValueError):
        b.extend(3)  # not coprime with itself
    assert b.is_subbase_of(b2)
    assert not b2.is_subbase_of(b)


def test_rnsbase_compose_decompose():
    # parity: tests/seal/util/rns.cpp:204-332
    cases = [
        ([2], 0), ([2], 1),
        ([2, 3], 5), ([2, 3], 0),
        ([3, 5, 7, 11], 1000), ([3, 5, 7, 11], 0),
        ([0xFFFFEE001, 0xFFFFC4001, 0x1FFFFE0001], 0x12345678901234567),
    ]
    for base_vals, v in cases:
        b = R.RNSBase(base_vals)
        residues = b.decompose(v)
        assert residues == [v % m for m in base_vals]
        assert b.compose(residues) == v % b.base_prod


def test_rnsbase_punctured_constants():
    b = R.RNSBase([3, 5, 7])
    assert b.base_prod == 105
    assert b.punctured_prod == [35, 21, 15]
    for p, ip, m in zip(b.punctured_prod, b.inv_punctured_prod, b.base):
        assert (p * ip) % m == 1


# ---------------------------------------------------------------------------
# BaseConverter (golden cases from rns.cpp:347-438)
# ---------------------------------------------------------------------------

def convert(ibase, obase, in_rows, n):
    bc = R.make_base_conv(R.RNSBase(ibase), R.RNSBase(obase))
    x = pair_of(in_rows, (len(ibase), n))
    return ints_of(R.fast_convert_array(x, bc))


def test_fast_convert_golden():
    out = convert([3], [2], [[0, 1, 2]], 3)
    assert list(out[0]) == [0, 1, 0]
    out = convert([2, 3], [2], [[0, 1, 0], [0, 1, 2]], 3)
    assert list(out[0]) == [0, 1, 0]
    out = convert([2, 3], [2, 3], [[1, 1, 0], [1, 2, 2]], 3)
    assert list(out[0]) == [1, 1, 0] and list(out[1]) == [1, 2, 2]
    out = convert([2, 3], [3, 4, 5], [[0, 1, 1], [0, 1, 2]], 3)
    assert list(out[0]) == [0, 1, 2]
    assert list(out[1]) == [0, 3, 1]
    assert list(out[2]) == [0, 2, 0]
    out = convert([3, 4, 5], [2, 3], [[0, 1], [0, 1], [0, 1]], 2)
    assert list(out[0]) == [0, 1] and list(out[1]) == [0, 1]


def test_fast_convert_large_primes():
    """Cross-check against the exact integer formula with 61-bit primes."""
    ibase = R.RNSBase([0x1FFFFFFFFFE00001, 0x1FFFFFFFFFC80001])
    obase = R.RNSBase([0x1FFFFFFFFFB40001, 0xFFA0001])
    n = 8
    vals = [random.randrange(ibase.base_prod) for _ in range(n)]
    rows = [[v % m for v in vals] for m in ibase.base]
    out = convert(ibase.base, obase.base, rows, n)
    for k, v in enumerate(vals):
        total = sum(
            ((v % m) * ip % m) * pp
            for m, ip, pp in zip(ibase.base, ibase.inv_punctured_prod, ibase.punctured_prod)
        )
        for r, p in enumerate(obase.base):
            assert out[r][k] == total % p


def test_exact_convert_array():
    """exact_convert returns x mod t exactly (CT-RSA 2019 correction)."""
    ibase = R.RNSBase([0xFFFFEE001, 0xFFFFC4001, 0x1FFFFE0001])
    t = 65537
    bc = R.make_base_conv(ibase, R.RNSBase([t]))
    n = 16
    vals = [random.randrange(ibase.base_prod // 2) for _ in range(n)]
    rows = [[v % m for v in vals] for m in ibase.base]
    x = pair_of(rows, (3, n))
    out = ints_of(R.exact_convert_array(x, bc))
    for k, v in enumerate(vals):
        assert out[0][k] == v % t, k


# ---------------------------------------------------------------------------
# RNSTool (golden cases from rns.cpp:440-1075)
# ---------------------------------------------------------------------------

def make_tool(n, q_primes, t=0):
    host = R.RNSToolHost(n, R.RNSBase(q_primes), t)
    from seal_tpu.utils.numth import get_power_of_two

    dev = R.make_rns_tool_device(host, get_power_of_two(n))
    return host, dev


def test_rnstool_initialize():
    host, _ = make_tool(32, [numth_prime(64, 20, i) for i in range(4)], 65537)
    assert host.base_Bsk.size == host.base_B.size + 1
    # CKKS case: t = 0
    make_tool(32, [numth_prime(64, 20, i) for i in range(4)], 0)
    with pytest.raises(ValueError):
        R.RNSToolHost(31, R.RNSBase([3]), 65537)


def numth_prime(factor, bits, index):
    from seal_tpu.utils import numth

    return numth.get_primes(factor, bits, index + 1)[index]


def test_fastbconv_m_tilde_golden():
    host, dev = make_tool(2, [3])
    m_tilde = host.m_tilde
    bskm = host.base_Bsk_m_tilde.base
    x = pair_of([[1, 2]], (1, 2))
    out = ints_of(R.fastbconv_m_tilde(x, dev))
    temp, temp2 = m_tilde % 3, (2 * m_tilde) % 3
    expect = [[temp % m, temp2 % m] for m in bskm]
    for r in range(len(bskm)):
        assert list(out[r]) == expect[r]

    host, dev = make_tool(2, [3, 5])
    m_tilde = host.m_tilde
    bskm = host.base_Bsk_m_tilde.base
    x = pair_of([[1, 1], [2, 2]], (2, 2))
    out = ints_of(R.fastbconv_m_tilde(x, dev))
    temp = ((2 * m_tilde) % 3) * 5 + ((4 * m_tilde) % 5) * 3
    for r in range(len(bskm)):
        assert list(out[r]) == [temp % bskm[r]] * 2


def test_sm_mrq_golden():
    host, dev = make_tool(2, [3])
    mt = host.m_tilde
    x = pair_of([[mt, 2 * mt], [mt, 2 * mt], [0, 0]], (3, 2))
    out = ints_of(R.sm_mrq(x, dev))
    assert list(out[0]) == [1, 2] and list(out[1]) == [1, 2]
    q0 = 3
    x = pair_of([[q0, q0], [q0, q0], [q0, q0]], (3, 2))
    out = ints_of(R.sm_mrq(x, dev))
    assert all(v == 0 for row in out for v in row)

    host, dev = make_tool(2, [3, 5])
    mt = host.m_tilde
    x = pair_of([[mt, 2 * mt]] * 3 + [[mt % mt, (2 * mt) % mt]], (4, 2))
    out = ints_of(R.sm_mrq(x, dev))
    assert all(list(out[r]) == [1, 2] for r in range(3))
    x = pair_of([[15, 30]] * 4, (4, 2))
    out = ints_of(R.sm_mrq(x, dev))
    assert all(v == 0 for row in out for v in row)
    x = pair_of([[2 * mt + 15, 2 * mt + 30]] * 4, (4, 2))
    out = ints_of(R.sm_mrq(x, dev))
    assert all(v == 2 for row in out for v in row)


def test_fast_floor_golden():
    host, dev = make_tool(2, [3])
    x = pair_of([[15, 3], [15, 3], [15, 3]], (3, 2))
    out = ints_of(R.fast_floor(x, dev))
    assert list(out[0]) == [5, 1] and list(out[1]) == [5, 1]
    x = pair_of([[17 % 3, 4 % 3], [17, 4], [17, 4]], (3, 2))
    out = ints_of(R.fast_floor(x, dev))
    assert list(out[0]) == [5, 1] and list(out[1]) == [5, 1]

    host, dev = make_tool(2, [3, 5])
    x = pair_of([[15 % 3, 30 % 3], [15 % 5, 30 % 5], [15, 30], [15, 30], [15, 30]], (5, 2))
    out = ints_of(R.fast_floor(x, dev))
    for r in range(3):
        assert list(out[r]) == [1, 2]
    # non-exact case: result off by at most 1
    x = pair_of([[21 % 3, 32 % 3], [21 % 5, 32 % 5], [21, 32], [21, 32], [21, 32]], (5, 2))
    out = ints_of(R.fast_floor(x, dev))
    for r, m in enumerate(host.base_Bsk.base):
        assert min((out[r][0] - 1) % m, (1 - out[r][0]) % m) <= 1
        assert min((out[r][1] - 2) % m, (2 - out[r][1]) % m) <= 1


def test_fastbconv_sk_golden():
    host, dev = make_tool(2, [3])
    x = pair_of([[1, 2], [1, 2]], (2, 2))
    out = ints_of(R.fastbconv_sk(x, dev))
    assert list(out[0]) == [1, 2]

    host, dev = make_tool(2, [3, 5])
    x = pair_of([[1, 2]] * 3, (3, 2))
    out = ints_of(R.fastbconv_sk(x, dev))
    assert list(out[0]) == [1, 2] and list(out[1]) == [1, 2]


def test_decrypt_scale_and_round_golden():
    host, dev = make_tool(2, [5, 7], t=3)
    x = pair_of([[35 % 5, 70 % 5], [35 % 7, 70 % 7]], (2, 2))
    out = ints_of(R.decrypt_scale_and_round(x, dev))
    assert list(out[0]) == [0, 0]
    x = pair_of([[29 % 5, (30 + 35) % 5], [29 % 7, (30 + 35) % 7]], (2, 2))
    out = ints_of(R.decrypt_scale_and_round(x, dev))
    assert list(out[0]) == [2, 0]


def test_divide_and_round_q_last_golden():
    host, dev = make_tool(2, [13, 7])
    x = pair_of([[1, 2], [1, 2]], (2, 2))
    out = ints_of(R.divide_and_round_q_last(x, dev))
    assert list(out[0]) == [0, 0]
    x = pair_of([[12, 11], [4, 3]], (2, 2))
    out = ints_of(R.divide_and_round_q_last(x, dev))
    assert list(out[0]) == [4, 3]
    x = pair_of([[6, 2], [5, 1]], (2, 2))  # values (19, 15)
    out = ints_of(R.divide_and_round_q_last(x, dev))
    assert list(out[0]) == [3, 2]

    host, dev = make_tool(2, [3, 5, 7, 11])
    x = pair_of([[1, 2], [1, 2], [1, 2], [1, 2]], (4, 2))
    out = ints_of(R.divide_and_round_q_last(x, dev))
    assert all(v == 0 for row in out for v in row)
    # values (60, 70): approximate result, off by <= 1
    x = pair_of([[0, 1], [0, 0], [4, 0], [5, 4]], (4, 2))
    out = ints_of(R.divide_and_round_q_last(x, dev))
    for (r, m), exp in zip(enumerate([3, 5, 7]), [[2, 0], [0, 1], [5, 6]]):
        assert (m + exp[0] - out[r][0]) % m <= 1
        assert (m + exp[1] - out[r][1]) % m <= 1


def test_divide_and_round_q_last_ntt_golden():
    host, dev = make_tool(2, [53, 13])
    tables = ntt_mod.build_device_tables(1, [53, 13])
    fwd = jax.jit(ntt_mod.ntt_forward)
    inv = jax.jit(ntt_mod.ntt_inverse)

    def run(vals):
        x = pair_of(vals, (2, 2))
        x = fwd(x, tables)
        out = R.divide_and_round_q_last_ntt(x, dev, tables)
        out = inv(out, ntt_mod.slice_tables(tables, 0, 1))
        return ints_of(out)

    out = run([[1, 2], [1, 2]])
    assert list(out[0]) == [0, 0]
    out = run([[4, 12], [4, 12]])
    assert (53 + 1 - out[0][0]) % 53 <= 1
    assert (53 + 2 - out[0][1]) % 53 <= 1
    out = run([[25, 35], [12, 9]])
    assert (53 + 2 - out[0][0]) % 53 <= 1
    assert (53 + 3 - out[0][1]) % 53 <= 1


def test_mod_t_and_divide_q_last():
    """BGV modswitch: output ≡ input * q_last^{-1} (mod t) and close to
    input/q_last; verified against the exact integer semantics."""
    t = 65537
    host, dev = make_tool(4, [0xFFFFEE001, 0xFFFFC4001], t)
    q = host.base_q
    n = 4
    vals = [random.randrange(q.base_prod) for _ in range(n)]
    rows = [[v % m for v in vals] for m in q.base]
    x = pair_of(rows, (2, n))
    out = ints_of(R.mod_t_and_divide_q_last(x, dev))
    q_last = q.base[-1]
    from seal_tpu.utils import numth

    inv_ql_t = numth.invert_uint_mod(q_last, t)
    for k, v in enumerate(vals):
        c_last = v % q_last
        neg_c = (-(c_last % t) * inv_ql_t) % t
        # result = (v - c_last)/q_last - neg_c (mod q_0)
        expected = ((v - c_last) // q_last - neg_c) % q.base[0]
        assert out[0][k] == expected


def test_rnsbase_contains_and_subbase():
    """RNSBaseTest.Contains / IsSubbaseOf parity (tests/seal/util/rns.cpp)."""
    from seal_tpu.ops.rns import RNSBase

    base = RNSBase([2, 3, 5, 7])
    assert base.contains(3)
    assert not base.contains(11)
    assert RNSBase([3, 5]).is_subbase_of(base)
    assert RNSBase([2, 3, 5, 7]).is_subbase_of(base)
    assert not RNSBase([3, 11]).is_subbase_of(base)
    assert not base.is_subbase_of(RNSBase([3, 5]))


def test_rnsbase_array_access():
    """RNSBaseTest.ArrayAccess parity: indexing and size."""
    from seal_tpu.ops.rns import RNSBase

    base = RNSBase([2, 3, 5])
    assert base.size == 3
    assert [base[i] for i in range(3)] == [2, 3, 5]
    import pytest as _pytest
    with _pytest.raises(IndexError):
        base[3]
