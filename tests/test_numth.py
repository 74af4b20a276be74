"""Host number-theory tests.

Golden values mirror the reference suite
(/root/reference/native/tests/seal/util/numth.cpp).
"""

from seal_tpu.utils import numth


def test_reverse_bits():
    assert numth.reverse_bits(0, 4) == 0
    assert numth.reverse_bits(1, 4) == 8
    assert numth.reverse_bits(0b1011, 4) == 0b1101
    assert numth.reverse_bits(3, 13) == 0b1100000000000


def test_is_prime():
    primes = [2, 3, 5, 7, 11, 13, 0xFFFFEE001, 0x7FFFFFFFE90001, 0xFFFFFFFFF70001]
    composites = [0, 1, 4, 6, 9, 15, 0xFFFFEE001 + 2, (1 << 60) - 1]
    for p in primes:
        assert numth.is_prime(p), hex(p)
    for c in composites:
        assert not numth.is_prime(c), hex(c)


def test_get_primes():
    # Largest 20-bit prime ≡ 1 (mod 8192)
    assert numth.get_primes(8192, 20, 1) == [0xFC001]
    ps = numth.get_primes(8192, 36, 2)
    assert ps == [0xFFFFEE001, 0xFFFFC4001]
    for p in ps:
        assert numth.is_prime(p) and p % 8192 == 1


def test_xgcd_invert():
    g, a, b = numth.xgcd(240, 46)
    assert g == 2 and a * 240 + b * 46 == 2
    assert numth.try_invert_uint_mod(3, 7) == 5
    assert numth.try_invert_uint_mod(2, 4) is None
    q = 0xFFFFEE001
    inv = numth.invert_uint_mod(12345, q)
    assert (inv * 12345) % q == 1


def test_naf():
    for value in [0, 1, 2, 3, 7, 11, -5, 123, -123, 4096, 0x7FFF]:
        assert sum(numth.naf(value)) == value
    # NAF has no adjacent nonzero digits
    for value in [7, 123, 255]:
        digits = numth.naf(value)
        powers = sorted(abs(d).bit_length() - 1 for d in digits)
        assert all(b - a >= 2 for a, b in zip(powers, powers[1:]))


def test_primitive_roots():
    # Golden values from reference tests/seal/util/numth.cpp:155-220
    assert numth.try_primitive_root(2, 11) == 10
    assert numth.try_primitive_root(2, 29) == 28
    assert numth.try_primitive_root(4, 29) in (12, 17)
    assert numth.try_minimal_primitive_root(2, 11) == 10
    assert numth.try_minimal_primitive_root(4, 29) == 12
    assert numth.try_minimal_primitive_root(2, 1234565441) == 1234565440
    assert numth.try_minimal_primitive_root(8, 1234565441) == 249725733


def test_minimal_primitive_root_ntt_prime():
    q = 0xFFFFEE001  # 36-bit NTT prime for n=4096
    degree = 8192
    root = numth.try_minimal_primitive_root(degree, q)
    assert root is not None
    assert numth.is_primitive_root(root, degree, q)
    # Minimality: no smaller odd power of root is below it
    cur = root
    sq = (root * root) % q
    for _ in range(degree // 2):
        assert cur >= root
        cur = (cur * sq) % q


def test_is_primitive_root_basics():
    assert numth.is_primitive_root(10, 2, 11)
    assert not numth.is_primitive_root(9, 2, 11)
    assert not numth.is_primitive_root(10, 4, 11)
