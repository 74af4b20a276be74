"""Seeded PRNG framework: blake2xb (default) and shake256 streams.

Parity: seal::Blake2xbPRNG / Shake256PRNG (/root/reference/native/src/seal/
randomgen.{h,cpp}; refill loop randomgen.cpp:201-223, buffer size 4096 at
randomgen.h:391) and the BLAKE2X XOF construction (util/blake2xb.c:36-149).
Byte-exact parity with the reference stream is THE prerequisite for
bit-exact keygen/encryption (SURVEY.md §7 hard part #2); validated against
vectors dumped from the compiled reference library (tests/vectors/).

Python's hashlib.blake2b exposes the full BLAKE2 tree parameter block;
BLAKE2X's xof_length field occupies the high 32 bits of blake2b's 64-bit
node_offset field, so `node_offset = i | (xof_length << 32)` reproduces the
reference's parameter blocks exactly.
"""

from __future__ import annotations

import enum
import hashlib
import secrets
import struct

PRNG_SEED_UINT64_COUNT = 8
PRNG_SEED_BYTE_COUNT = PRNG_SEED_UINT64_COUNT * 8
_BUFFER_SIZE = 4096
_B2B_OUT = 64


class PrngType(enum.IntEnum):
    UNKNOWN = 0
    BLAKE2XB = 1
    SHAKE256 = 2


def blake2xb(outlen: int, data: bytes, key: bytes = b"") -> bytes:
    """BLAKE2Xb XOF, byte-identical to the reference C implementation.

    Root hash uses hashlib's fast C blake2b (its parameters are
    expressible there); output blocks need depth=0, which hashlib
    rejects, so they go through the pure parameter-block implementation.
    """
    from seal_tpu.utils.blake2 import blake2b_param

    if not (0 < outlen <= 0xFFFFFFFF):
        raise ValueError("invalid outlen")
    xof_hi = outlen << 32
    root = hashlib.blake2b(
        data,
        digest_size=_B2B_OUT,
        key=key,
        fanout=1,
        depth=1,
        leaf_size=0,
        node_offset=xof_hi,  # node_offset=0, xof_length=outlen
        node_depth=0,
        inner_size=0,
    ).digest()
    out = bytearray()
    i = 0
    remaining = outlen
    while remaining > 0:
        block_size = min(remaining, _B2B_OUT)
        out += blake2b_param(
            root,
            digest_size=block_size,
            fanout=0,
            depth=0,
            leaf_size=_B2B_OUT,
            node_offset=i | xof_hi,
            node_depth=0,
            inner_size=_B2B_OUT,
        )
        remaining -= block_size
        i += 1
    return bytes(out)


def random_seed() -> tuple:
    """Fresh random 512-bit seed (the analogue of random_bytes -> seed)."""
    return tuple(struct.unpack("<8Q", secrets.token_bytes(PRNG_SEED_BYTE_COUNT)))


class UniformRandomGenerator:
    """Buffered deterministic byte stream (4096-byte refills)."""

    def __init__(self, seed):
        self.seed = tuple(int(s) & ((1 << 64) - 1) for s in seed)
        if len(self.seed) != PRNG_SEED_UINT64_COUNT:
            raise ValueError("seed must be 8 uint64 words")
        self._seed_bytes = struct.pack("<8Q", *self.seed)
        self._counter = 0
        self._buffer = b""
        self._pos = 0

    def _refill(self) -> bytes:
        raise NotImplementedError

    def _refill_n(self, n_blocks: int) -> bytes:
        """n_blocks consecutive 4096-byte refills (bulk path hook)."""
        return b"".join(self._refill() for _ in range(n_blocks))

    def generate(self, byte_count: int) -> bytes:
        out = bytearray()
        while byte_count:
            if self._pos == len(self._buffer):
                n_blocks = max(1, byte_count // _BUFFER_SIZE)
                self._buffer = self._refill_n(n_blocks)
                self._pos = 0
            take = min(byte_count, len(self._buffer) - self._pos)
            out += self._buffer[self._pos:self._pos + take]
            self._pos += take
            byte_count -= take
        return bytes(out)

    def info(self):
        return (self.prng_type, self.seed)


class Blake2xbPRNG(UniformRandomGenerator):
    prng_type = PrngType.BLAKE2XB

    def _refill(self) -> bytes:
        return self._refill_n(1)

    def _refill_n(self, n_blocks: int) -> bytes:
        from seal_tpu import native

        block = native.blake2xb_stream(self.seed, self._counter,
                                       n_blocks * _BUFFER_SIZE)
        if block is None:
            block = b"".join(
                blake2xb(_BUFFER_SIZE, struct.pack("<Q", self._counter + i),
                         self._seed_bytes)
                for i in range(n_blocks)
            )
        self._counter += n_blocks
        return block


class Shake256PRNG(UniformRandomGenerator):
    prng_type = PrngType.SHAKE256

    def _refill(self) -> bytes:
        data = self._seed_bytes + struct.pack("<Q", self._counter)
        self._counter += 1
        return hashlib.shake_256(data).digest(_BUFFER_SIZE)


class UniformRandomGeneratorFactory:
    """Creates PRNGs; seeded factories reproduce streams (Blake2xbPRNGFactory
    parity, randomgen.h:532-560)."""

    def __init__(self, prng_type: PrngType = PrngType.BLAKE2XB, seed=None):
        self.prng_type = prng_type
        self.default_seed = tuple(seed) if seed is not None else None

    def create(self, seed=None) -> UniformRandomGenerator:
        use = seed if seed is not None else self.default_seed
        if use is None:
            use = random_seed()
        cls = {PrngType.BLAKE2XB: Blake2xbPRNG, PrngType.SHAKE256: Shake256PRNG}[self.prng_type]
        return cls(use)


def make_prng(info_type: PrngType, seed) -> UniformRandomGenerator:
    """Reconstruct a PRNG from serialized (type, seed) info."""
    cls = {PrngType.BLAKE2XB: Blake2xbPRNG, PrngType.SHAKE256: Shake256PRNG}[PrngType(info_type)]
    return cls(seed)
