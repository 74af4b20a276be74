"""BLAKE2b with full tree-parameter control, from the RFC 7693 spec.

Python's hashlib exposes blake2b but rejects depth=0, which the BLAKE2X XOF
output blocks require (the reference's util/blake2xb.c:118-141 sets
fanout=0, depth=0, leaf_length=64, inner_length=64). This module implements
the compression function directly so any parameter block can be formed.
hashlib is still used on the hot root-hash path where its parameters
suffice (see seal_tpu.randomgen); a C++ implementation will take over both
paths in the native runtime layer.

Original implementation from the published specification; validated against
reference-dumped vectors in tests/vectors/prng.json.
"""

from __future__ import annotations

import struct

_MASK = (1 << 64) - 1

_IV = (
    0x6A09E667F3BCC908, 0xBB67AE8584CAA73B,
    0x3C6EF372FE94F82B, 0xA54FF53A5F1D36F1,
    0x510E527FADE682D1, 0x9B05688C2B3E6C1F,
    0x1F83D9ABFB41BD6B, 0x5BE0CD19137E2179,
)

_SIGMA = (
    (0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15),
    (14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3),
    (11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4),
    (7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8),
    (9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13),
    (2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9),
    (12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11),
    (13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10),
    (6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5),
    (10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0),
    (0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15),
    (14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3),
)


def _rotr(x, n):
    return ((x >> n) | (x << (64 - n))) & _MASK


def _compress(h, block, t, last):
    m = struct.unpack("<16Q", block)
    v = list(h) + list(_IV)
    v[12] ^= t & _MASK
    v[13] ^= (t >> 64) & _MASK
    if last:
        v[14] ^= _MASK

    for rnd in _SIGMA:
        for i, (a, b, c, d) in enumerate(
            ((0, 4, 8, 12), (1, 5, 9, 13), (2, 6, 10, 14), (3, 7, 11, 15),
             (0, 5, 10, 15), (1, 6, 11, 12), (2, 7, 8, 13), (3, 4, 9, 14))
        ):
            x = m[rnd[2 * i]]
            y = m[rnd[2 * i + 1]]
            va, vb, vc, vd = v[a], v[b], v[c], v[d]
            va = (va + vb + x) & _MASK
            vd = _rotr(vd ^ va, 32)
            vc = (vc + vd) & _MASK
            vb = _rotr(vb ^ vc, 24)
            va = (va + vb + y) & _MASK
            vd = _rotr(vd ^ va, 16)
            vc = (vc + vd) & _MASK
            vb = _rotr(vb ^ vc, 63)
            v[a], v[b], v[c], v[d] = va, vb, vc, vd

    return tuple((h[i] ^ v[i] ^ v[i + 8]) & _MASK for i in range(8))


def blake2b_param(
    data: bytes,
    digest_size: int = 64,
    key: bytes = b"",
    fanout: int = 1,
    depth: int = 1,
    leaf_size: int = 0,
    node_offset: int = 0,
    node_depth: int = 0,
    inner_size: int = 0,
    salt: bytes = b"",
    person: bytes = b"",
    last_node: bool = False,
) -> bytes:
    """blake2b with an arbitrary parameter block (RFC 7693 §2.5/2.8)."""
    if not (0 < digest_size <= 64):
        raise ValueError("digest_size")
    param = struct.pack(
        "<BBBBIQBB14x16s16s",
        digest_size, len(key), fanout, depth,
        leaf_size, node_offset, node_depth, inner_size,
        salt.ljust(16, b"\0"), person.ljust(16, b"\0"),
    )
    assert len(param) == 64
    h = tuple(_IV[i] ^ w for i, w in enumerate(struct.unpack("<8Q", param)))

    buf = b""
    if key:
        buf = key.ljust(128, b"\0")
    buf += data

    t = 0
    # process all but the final (possibly partial) block
    n_full = (len(buf) - 1) // 128 if buf else 0
    for i in range(n_full):
        t += 128
        h = _compress(h, buf[i * 128:(i + 1) * 128], t, False)
    tail = buf[n_full * 128:]
    t += len(tail)
    h = _compress(h, tail.ljust(128, b"\0"), t, True)
    return struct.pack("<8Q", *h)[:digest_size]
