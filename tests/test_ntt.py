"""NTT tests: golden values from the reference suite
(/root/reference/native/tests/seal/util/ntt.cpp), naive-DFT cross-checks,
roundtrips, lazy ranges, and batched multi-prime operation."""

import random

import jax
import numpy as np
import pytest

from seal_tpu.modulus import CoeffModulus
from seal_tpu.ops import limb
from seal_tpu.ops.ntt import build_device_tables, build_ntt_tables, ntt_forward, ntt_inverse
from seal_tpu.utils import numth

random.seed(777)

fwd_j = jax.jit(ntt_forward, static_argnames=("lazy",))
inv_j = jax.jit(ntt_inverse, static_argnames=("lazy",))


def run_fwd(values, log_n, qs, lazy=False):
    L = len(qs)
    n = 1 << log_n
    t = build_device_tables(log_n, qs)
    x = limb.arr_to_u64(values, shape=(L, n))
    out = fwd_j(x, t, lazy=lazy)
    return limb.u64_to_ints(out)


def run_inv(values, log_n, qs, lazy=False):
    L = len(qs)
    n = 1 << log_n
    t = build_device_tables(log_n, qs)
    x = limb.arr_to_u64(values, shape=(L, n))
    out = inv_j(x, t, lazy=lazy)
    return limb.u64_to_ints(out)


def naive_negacyclic_ntt(values, log_n, q):
    """O(n^2) reference: out[bitrev(i)] = sum_j a_j ψ^{(2i+1) j} mod q."""
    n = 1 << log_n
    psi = build_ntt_tables(log_n, q).root
    out = []
    for i in range(n):
        e = pow(psi, 2 * i + 1, q)
        acc, w = 0, 1
        for j in range(n):
            acc = (acc + values[j] * w) % q
            w = (w * e) % q
        out.append(acc)
    # natural -> bit-reversed output order
    res = [0] * n
    for i in range(n):
        res[numth.reverse_bits(i, log_n)] = out[i]
    return res


def test_root_powers_golden():
    """Reference golden values (tests/seal/util/ntt.cpp:53-74)."""
    q = 0xFFFFFFFFFFC0001
    t1 = build_ntt_tables(1, q)
    assert t1.root_powers[0] == 1
    assert t1.root_powers[1] == 288794978602139552
    assert t1.inv_root_powers[1] == numth.invert_uint_mod(288794978602139552, q)
    t2 = build_ntt_tables(2, q)
    assert t2.root_powers[0] == 1
    assert t2.root_powers[1] == 288794978602139552
    assert t2.root_powers[2] == 178930308976060547
    assert t2.root_powers[3] == 748001537669050592


def test_negacyclic_ntt_golden():
    """Reference golden transform (tests/seal/util/ntt.cpp:76-103)."""
    q = 0xFFFFFFFFFFC0001
    assert list(run_fwd([[0, 0]], 1, [q])[0]) == [0, 0]
    assert list(run_fwd([[1, 0]], 1, [q])[0]) == [1, 1]
    assert list(run_fwd([[1, 1]], 1, [q])[0]) == [
        288794978602139553,
        864126526004445282,
    ]


@pytest.mark.parametrize("log_n", [2, 3, 5])
def test_forward_matches_naive(log_n):
    q = numth.get_prime(2 << log_n, 30)
    n = 1 << log_n
    vals = [random.randrange(q) for _ in range(n)]
    got = list(run_fwd([vals], log_n, [q])[0])
    assert got == naive_negacyclic_ntt(vals, log_n, q)


@pytest.mark.parametrize("log_n,bits", [(3, 60), (6, 30), (10, 40), (12, 36)])
def test_roundtrip(log_n, bits):
    q = numth.get_prime(2 << log_n, bits)
    n = 1 << log_n
    vals = [random.randrange(q) for _ in range(n)]
    freq = run_fwd([vals], log_n, [q])
    back = list(run_inv([list(freq[0])], log_n, [q])[0])
    assert back == vals


def test_roundtrip_multi_prime_batch():
    """Batched towers + leading ciphertext axis, the production layout."""
    log_n, n = 8, 256
    qs = [int(m) for m in CoeffModulus.create(n, [30, 30, 31])]
    L = len(qs)
    t = build_device_tables(log_n, qs)
    vals = [[[random.randrange(q) for _ in range(n)] for q in qs] for _ in range(2)]
    x = limb.arr_to_u64(vals, shape=(2, L, n))
    back = limb.u64_to_ints(inv_j(fwd_j(x, t), t))
    for c in range(2):
        for i in range(L):
            assert list(back[c][i]) == vals[c][i]


def test_lazy_ranges():
    log_n = 6
    n = 1 << log_n
    q = numth.get_prime(2 << log_n, 50)
    vals = [random.randrange(q) for _ in range(n)]
    lazy_f = run_fwd([vals], log_n, [q], lazy=True)
    full_f = run_fwd([vals], log_n, [q])
    for a, b in zip(lazy_f[0], full_f[0]):
        assert a < 4 * q and a % q == b
    lazy_i = run_inv([list(full_f[0])], log_n, [q], lazy=True)
    full_i = run_inv([list(full_f[0])], log_n, [q])
    for a, b in zip(lazy_i[0], full_i[0]):
        assert a < 2 * q and a % q == b


def test_negacyclic_convolution_property():
    """NTT(a) ⊙ NTT(b) -> INTT == negacyclic product a*b mod (X^n+1, q)."""
    log_n, n = 4, 16
    q = numth.get_prime(2 << log_n, 40)
    a = [random.randrange(q) for _ in range(n)]
    b = [random.randrange(q) for _ in range(n)]
    # schoolbook negacyclic convolution
    conv = [0] * n
    for i in range(n):
        for j in range(n):
            k = i + j
            if k < n:
                conv[k] = (conv[k] + a[i] * b[j]) % q
            else:
                conv[k - n] = (conv[k - n] - a[i] * b[j]) % q
    t = build_device_tables(log_n, [q])
    pa = limb.arr_to_u64([a], shape=(1, n))
    pb = limb.arr_to_u64([b], shape=(1, n))
    fa, fb = fwd_j(pa, t), fwd_j(pb, t)
    from seal_tpu.ops.modring import dyadic_product, make_mod_consts

    prod = dyadic_product(fa, fb, t.mc)
    got = list(limb.u64_to_ints(inv_j(prod, t))[0])
    assert got == conv
