"""Modulus type and standard-parameter factories.

Parity targets in the reference: seal::Modulus with its precomputed Barrett
constant (/root/reference/native/src/seal/modulus.{h,cpp}:37-420),
CoeffModulus::{MaxBitCount,BFVDefault,Create} (modulus.h:424-537) and
PlainModulus::Batching (modulus.h:540-559).

Host-side: values are exact Python ints. The Barrett `const_ratio`
(floor(2^128/q), three 64-bit words) and Shoup quotients computed here are
shipped to the device as uint32 limb tensors by the context layer.
"""

from __future__ import annotations

import enum
import functools
from dataclasses import dataclass, field

from seal_tpu.utils import numth
from seal_tpu.utils import hestdparms

MOD_BIT_COUNT_MAX = 61
MOD_BIT_COUNT_MIN = 2
USER_MOD_BIT_COUNT_MAX = 60
USER_MOD_BIT_COUNT_MIN = 2
INTERNAL_MOD_BIT_COUNT = 61
COEFF_MOD_COUNT_MAX = 64
COEFF_MOD_COUNT_MIN = 1
POLY_MOD_DEGREE_MAX = 131072
POLY_MOD_DEGREE_MIN = 2
CIPHERTEXT_SIZE_MAX = 16
CIPHERTEXT_SIZE_MIN = 2


class SecLevelType(enum.IntEnum):
    """Security level per HomomorphicEncryption.org standard
    (ref: seal/modulus.h sec_level_type)."""

    NONE = 0
    TC128 = 128
    TC192 = 192
    TC256 = 256


@dataclass(frozen=True)
class Modulus:
    """An up-to-61-bit modulus with precomputed Barrett constant.

    const_ratio = floor(2^128 / value) as three 64-bit words (low to high),
    matching the reference's layout (modulus.cpp Modulus::set_value) so that
    barrett_reduce_64/128 on device reproduce identical arithmetic.
    """

    value: int
    bit_count: int = field(init=False)
    const_ratio: tuple[int, int, int] = field(init=False)
    is_prime: bool = field(init=False)

    def __post_init__(self):
        v = self.value
        if v == 0:
            object.__setattr__(self, "bit_count", 0)
            object.__setattr__(self, "const_ratio", (0, 0, 0))
            object.__setattr__(self, "is_prime", False)
            return
        if v.bit_length() > MOD_BIT_COUNT_MAX or v < 2:
            raise ValueError(f"modulus value {v} out of range")
        ratio = (1 << 128) // v
        mask = (1 << 64) - 1
        object.__setattr__(self, "bit_count", v.bit_length())
        object.__setattr__(
            self, "const_ratio", (ratio & mask, (ratio >> 64) & mask, ratio >> 128)
        )
        object.__setattr__(self, "is_prime", numth.is_prime(v))

    def __int__(self) -> int:
        return self.value

    def reduce(self, x: int) -> int:
        return x % self.value

    @property
    def is_zero(self) -> bool:
        return self.value == 0

    # value comparisons against Modulus or plain ints (modulus.h:315-381
    # operator==/!=/</<=/>/>= overloads on value)
    def __eq__(self, other) -> bool:
        if isinstance(other, Modulus):
            return self.value == other.value
        if isinstance(other, int):
            return self.value == other
        return NotImplemented

    def __hash__(self) -> int:
        return hash(self.value)

    def __lt__(self, other):
        if isinstance(other, (Modulus, int)):
            return self.value < _as_int(other)
        return NotImplemented

    def __le__(self, other):
        if isinstance(other, (Modulus, int)):
            return self.value <= _as_int(other)
        return NotImplemented

    def __gt__(self, other):
        if isinstance(other, (Modulus, int)):
            return self.value > _as_int(other)
        return NotImplemented

    def __ge__(self, other):
        if isinstance(other, (Modulus, int)):
            return self.value >= _as_int(other)
        return NotImplemented

    def __repr__(self) -> str:
        return f"Modulus({self.value:#x})"


def _as_int(m) -> int:
    return m.value if isinstance(m, Modulus) else int(m)


# Default coefficient-modulus prime tables (util/globals.cpp:23-233).
# The reference hardcodes the prime values; they are reproducible as the
# largest primes p < 2^b with p ≡ 1 (mod 2n), grouped by bit size (ascending
# group order, descending within a group). We store the bit-size shapes and
# regenerate the primes; tests pin exact values against the reference table.
_DEFAULT_BIT_SHAPES: dict[int, dict[int, list[tuple[int, int]]]] = {
    128: {
        1024: [(27, 1)],
        2048: [(54, 1)],
        4096: [(36, 2), (37, 1)],
        8192: [(43, 2), (44, 3)],
        16384: [(48, 3), (49, 6)],
        32768: [(55, 15), (56, 1)],
    },
    192: {
        1024: [(19, 1)],
        2048: [(37, 1)],
        4096: [(25, 3)],
        8192: [(38, 4)],
        16384: [(50, 6)],
        32768: [(54, 5), (55, 6)],
    },
    256: {
        1024: [(14, 1)],
        2048: [(29, 1)],
        4096: [(58, 1)],
        8192: [(39, 2), (40, 1)],
        16384: [(47, 3), (48, 2)],
        32768: [(52, 1), (53, 8)],
    },
}


# Historical single-prime entries in the reference tables that do not follow
# the get_primes(2n, b) rule (they are ≡ 1 mod a larger power of two, chosen
# by an earlier SEAL release); pinned verbatim for bit-compatibility.
_DEFAULT_OVERRIDES: dict[tuple[int, int], tuple[int, ...]] = {
    (1024, 128): (0x7E00001,),
    (2048, 128): (0x3FFFFFFF000001,),
    (2048, 192): (0x1FFFFC0001,),
    (2048, 256): (0x1FFC0001,),
    (4096, 256): (0x3FFFFFFFF040001,),
}


@functools.lru_cache(maxsize=None)
def _default_coeff_modulus(poly_modulus_degree: int, sec_level: int) -> tuple[int, ...]:
    override = _DEFAULT_OVERRIDES.get((poly_modulus_degree, sec_level))
    if override is not None:
        return override
    shapes = _DEFAULT_BIT_SHAPES[sec_level].get(poly_modulus_degree)
    if shapes is None:
        raise ValueError(
            "no default parameters for this poly_modulus_degree/security level"
        )
    primes: list[int] = []
    for bit_size, count in shapes:
        primes.extend(numth.get_primes(2 * poly_modulus_degree, bit_size, count))
    return tuple(primes)


class CoeffModulus:
    """Factory for coefficient-modulus prime chains."""

    @staticmethod
    def max_bit_count(poly_modulus_degree: int, sec_level: SecLevelType = SecLevelType.TC128) -> int:
        if sec_level == SecLevelType.NONE:
            return COEFF_MOD_COUNT_MAX * MOD_BIT_COUNT_MAX
        return hestdparms.max_bit_count(poly_modulus_degree, int(sec_level))

    # Aliases mirroring the reference's PascalCase API.
    MaxBitCount = max_bit_count

    @staticmethod
    def bfv_default(
        poly_modulus_degree: int, sec_level: SecLevelType = SecLevelType.TC128
    ) -> list[Modulus]:
        if sec_level == SecLevelType.NONE:
            raise ValueError("sec_level cannot be none")
        values = _default_coeff_modulus(poly_modulus_degree, int(sec_level))
        return [Modulus(v) for v in values]

    BFVDefault = bfv_default

    @staticmethod
    def create(
        poly_modulus_degree: int,
        bit_sizes: list[int],
        plain_modulus: "Modulus | int | None" = None,
    ) -> list[Modulus]:
        """Distinct NTT-friendly primes, one per requested bit size.

        Matches the reference's assignment order (modulus.cpp:143-229): per
        distinct bit size, fetch the largest `count` primes ≡ 1 (mod 2n
        [·t/gcd(t,2n) when a plain modulus is given]), then hand them out to
        the bit_sizes positions smallest-first.
        """
        if (
            poly_modulus_degree > POLY_MOD_DEGREE_MAX
            or poly_modulus_degree < POLY_MOD_DEGREE_MIN
            or numth.get_power_of_two(poly_modulus_degree) < 0
        ):
            raise ValueError("poly_modulus_degree is invalid")
        if len(bit_sizes) > COEFF_MOD_COUNT_MAX or not bit_sizes:
            raise ValueError("bit_sizes is invalid")
        if max(bit_sizes) > USER_MOD_BIT_COUNT_MAX or min(bit_sizes) < USER_MOD_BIT_COUNT_MIN:
            raise ValueError("bit_sizes is invalid")

        factor = 2 * poly_modulus_degree
        if plain_modulus is not None:
            t = _as_int(plain_modulus)
            factor *= t // numth.gcd(t, factor)

        count_table: dict[int, int] = {}
        for size in bit_sizes:
            count_table[size] = count_table.get(size, 0) + 1
        prime_table = {
            size: numth.get_primes(factor, size, count)
            for size, count in count_table.items()
        }
        result = []
        for size in bit_sizes:
            result.append(Modulus(prime_table[size].pop()))
        return result

    Create = create


class PlainModulus:
    """Factory for batching-capable plaintext moduli (modulus.h:540-559)."""

    @staticmethod
    def batching(poly_modulus_degree: int, bit_size: int) -> Modulus:
        return CoeffModulus.create(poly_modulus_degree, [bit_size])[0]

    Batching = batching

    @staticmethod
    def batching_many(poly_modulus_degree: int, bit_sizes: list[int]) -> list[Modulus]:
        return CoeffModulus.create(poly_modulus_degree, bit_sizes)
