"""Modulus / CoeffModulus / PlainModulus tests.

Expected prime values pinned from the reference default tables
(/root/reference/native/src/seal/util/globals.cpp:23-233) and factory
semantics (modulus.cpp:143-229).
"""

import pytest

from seal_tpu.modulus import CoeffModulus, Modulus, PlainModulus, SecLevelType


def test_modulus_const_ratio():
    for v in [2, 3, 0xFC001, 0xFFFFEE001, (1 << 61) - 1, 0x7FFFFFFFE90001]:
        m = Modulus(v)
        ratio = (1 << 128) // v
        mask = (1 << 64) - 1
        assert m.const_ratio == (ratio & mask, (ratio >> 64) & mask, ratio >> 128)
        assert m.bit_count == v.bit_length()


def test_modulus_validation():
    with pytest.raises(ValueError):
        Modulus(1)
    with pytest.raises(ValueError):
        Modulus(1 << 62)
    z = Modulus(0)
    assert z.bit_count == 0 and z.const_ratio == (0, 0, 0)


def test_bfv_default_128():
    expected = {
        1024: [0x7E00001],
        2048: [0x3FFFFFFF000001],
        4096: [0xFFFFEE001, 0xFFFFC4001, 0x1FFFFE0001],
        8192: [0x7FFFFFD8001, 0x7FFFFFC8001, 0xFFFFFFFC001, 0xFFFFFF6C001, 0xFFFFFEBC001],
        16384: [
            0xFFFFFFFD8001, 0xFFFFFFFA0001, 0xFFFFFFF00001, 0x1FFFFFFF68001,
            0x1FFFFFFF50001, 0x1FFFFFFEE8001, 0x1FFFFFFEA0001, 0x1FFFFFFE88001,
            0x1FFFFFFE48001,
        ],
        32768: [
            0x7FFFFFFFE90001, 0x7FFFFFFFBF0001, 0x7FFFFFFFBD0001, 0x7FFFFFFFBA0001,
            0x7FFFFFFFAA0001, 0x7FFFFFFFA50001, 0x7FFFFFFF9F0001, 0x7FFFFFFF7E0001,
            0x7FFFFFFF770001, 0x7FFFFFFF380001, 0x7FFFFFFF330001, 0x7FFFFFFF2D0001,
            0x7FFFFFFF170001, 0x7FFFFFFF150001, 0x7FFFFFFEF00001, 0xFFFFFFFFF70001,
        ],
    }
    for n, primes in expected.items():
        got = [m.value for m in CoeffModulus.bfv_default(n)]
        assert got == primes, f"n={n}"


def test_bfv_default_other_levels():
    assert [m.value for m in CoeffModulus.bfv_default(1024, SecLevelType.TC192)] == [0x7F001]
    assert [m.value for m in CoeffModulus.bfv_default(2048, SecLevelType.TC192)] == [0x1FFFFC0001]
    assert [m.value for m in CoeffModulus.bfv_default(4096, SecLevelType.TC192)] == [
        0x1FFC001, 0x1FCE001, 0x1FC0001]
    assert [m.value for m in CoeffModulus.bfv_default(1024, SecLevelType.TC256)] == [0x3001]
    assert [m.value for m in CoeffModulus.bfv_default(2048, SecLevelType.TC256)] == [0x1FFC0001]
    assert [m.value for m in CoeffModulus.bfv_default(4096, SecLevelType.TC256)] == [0x3FFFFFFFF040001]
    assert [m.value for m in CoeffModulus.bfv_default(32768, SecLevelType.TC256)] == [
        0xFFFFFFFF00001, 0x1FFFFFFFE30001, 0x1FFFFFFFD80001, 0x1FFFFFFFD10001,
        0x1FFFFFFFC50001, 0x1FFFFFFFBF0001, 0x1FFFFFFFB90001, 0x1FFFFFFFB60001,
        0x1FFFFFFFA50001]


def test_max_bit_count():
    assert CoeffModulus.max_bit_count(4096) == 109
    assert CoeffModulus.max_bit_count(8192, SecLevelType.TC192) == 152
    assert CoeffModulus.max_bit_count(32768, SecLevelType.TC256) == 476
    assert CoeffModulus.max_bit_count(4096, SecLevelType.NONE) == 64 * 61


def test_create_order_and_congruence():
    n = 4096
    mods = CoeffModulus.create(n, [36, 36, 37])
    # smallest-first hand-out within equal bit sizes (modulus.cpp:177-182)
    assert mods[0].value == 0xFFFFC4001
    assert mods[1].value == 0xFFFFEE001
    assert mods[2].value == 0x1FFFFE0001
    for m in mods:
        assert m.is_prime and m.value % (2 * n) == 1
    assert len({m.value for m in mods}) == 3


def test_create_with_plain_modulus():
    n = 4096
    t = PlainModulus.batching(n, 20)
    assert t.value == 0xFC001
    mods = CoeffModulus.create(n, [40, 40], t)
    factor = 2 * n * (t.value // 1)  # gcd(t, 2n) == 1 since t prime > 2n
    for m in mods:
        assert m.value % factor == 1 and m.is_prime


def test_create_validation():
    with pytest.raises(ValueError):
        CoeffModulus.create(4095, [30])
    with pytest.raises(ValueError):
        CoeffModulus.create(4096, [61])
    with pytest.raises(ValueError):
        CoeffModulus.create(4096, [])


def test_modulus_value_comparisons():
    """modulus.h:315-381 operator overloads: compare by value, against
    Modulus or plain ints; usable as dict keys."""
    from seal_tpu.modulus import Modulus

    m = Modulus(257)
    assert m == Modulus(257) and m == 257 and m != 256
    assert m < 1031 and m <= Modulus(257) and m > 2 and m >= 257
    assert Modulus(0).is_zero and not m.is_zero
    assert hash(m) == hash(Modulus(257))
    assert {m: 1}[Modulus(257)] == 1
