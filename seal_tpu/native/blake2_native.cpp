// Native blake2b / blake2xb engine for the host-side PRNG hot path.
//
// Original implementation from the RFC 7693 / BLAKE2X specifications (not
// derived from the reference's vendored blake2b.c). Exposes a C ABI consumed
// via ctypes (seal_tpu/native/__init__.py); the pure-Python implementation
// in seal_tpu/utils/blake2.py remains the fallback and the correctness
// cross-check.
//
// Build: g++ -O3 -shared -fPIC blake2_native.cpp -o libsealtpu_native.so

#include <cstdint>
#include <cstring>
#include <cstddef>

namespace {

constexpr uint64_t IV[8] = {
    0x6A09E667F3BCC908ULL, 0xBB67AE8584CAA73BULL,
    0x3C6EF372FE94F82BULL, 0xA54FF53A5F1D36F1ULL,
    0x510E527FADE682D1ULL, 0x9B05688C2B3E6C1FULL,
    0x1F83D9ABFB41BD6BULL, 0x5BE0CD19137E2179ULL,
};

constexpr uint8_t SIGMA[12][16] = {
    { 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15 },
    { 14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3 },
    { 11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4 },
    { 7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8 },
    { 9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13 },
    { 2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9 },
    { 12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11 },
    { 13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10 },
    { 6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5 },
    { 10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0 },
    { 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15 },
    { 14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3 },
};

inline uint64_t rotr64(uint64_t x, int n) { return (x >> n) | (x << (64 - n)); }

inline uint64_t load64(const uint8_t *p)
{
    uint64_t v;
    std::memcpy(&v, p, 8);
    return v;  // little-endian hosts only (x86/ARM)
}

inline void store64(uint8_t *p, uint64_t v) { std::memcpy(p, &v, 8); }

struct Param {
    uint8_t digest_length;
    uint8_t key_length;
    uint8_t fanout;
    uint8_t depth;
    uint32_t leaf_length;
    uint64_t node_offset;  // includes BLAKE2X xof_length in the high 32 bits
    uint8_t node_depth;
    uint8_t inner_length;
};

void compress(uint64_t h[8], const uint8_t block[128], uint64_t t, bool last)
{
    uint64_t m[16], v[16];
    for (int i = 0; i < 16; i++) m[i] = load64(block + 8 * i);
    for (int i = 0; i < 8; i++) v[i] = h[i];
    for (int i = 0; i < 8; i++) v[8 + i] = IV[i];
    v[12] ^= t;
    // t is at most 2^64-1 here (streams far below that); high word stays 0
    if (last) v[14] = ~v[14];

#define G(r, i, a, b, c, d)                     \
    a = a + b + m[SIGMA[r][2 * i]];             \
    d = rotr64(d ^ a, 32);                      \
    c = c + d;                                  \
    b = rotr64(b ^ c, 24);                      \
    a = a + b + m[SIGMA[r][2 * i + 1]];         \
    d = rotr64(d ^ a, 16);                      \
    c = c + d;                                  \
    b = rotr64(b ^ c, 63);

    for (int r = 0; r < 12; r++) {
        G(r, 0, v[0], v[4], v[8], v[12]);
        G(r, 1, v[1], v[5], v[9], v[13]);
        G(r, 2, v[2], v[6], v[10], v[14]);
        G(r, 3, v[3], v[7], v[11], v[15]);
        G(r, 4, v[0], v[5], v[10], v[15]);
        G(r, 5, v[1], v[6], v[11], v[12]);
        G(r, 6, v[2], v[7], v[8], v[13]);
        G(r, 7, v[3], v[4], v[9], v[14]);
    }
#undef G
    for (int i = 0; i < 8; i++) h[i] ^= v[i] ^ v[8 + i];
}

void blake2b(const Param &p, const uint8_t *key, size_t keylen,
             const uint8_t *in, size_t inlen, uint8_t *out)
{
    uint64_t h[8];
    uint8_t pb[64] = { 0 };
    pb[0] = p.digest_length;
    pb[1] = p.key_length;
    pb[2] = p.fanout;
    pb[3] = p.depth;
    std::memcpy(pb + 4, &p.leaf_length, 4);
    std::memcpy(pb + 8, &p.node_offset, 8);
    pb[16] = p.node_depth;
    pb[17] = p.inner_length;
    for (int i = 0; i < 8; i++) h[i] = IV[i] ^ load64(pb + 8 * i);

    uint8_t block[128];
    uint64_t t = 0;
    if (keylen) {
        std::memset(block, 0, 128);
        std::memcpy(block, key, keylen);
        if (inlen == 0) {
            t = 128;
            compress(h, block, t, true);
            goto emit;
        }
        t = 128;
        compress(h, block, t, false);
    }
    while (inlen > 128) {
        t += 128;
        compress(h, in, t, false);
        in += 128;
        inlen -= 128;
    }
    std::memset(block, 0, 128);
    std::memcpy(block, in, inlen);
    t += inlen;
    compress(h, block, t, true);
emit:
    uint8_t full[64];
    for (int i = 0; i < 8; i++) store64(full + 8 * i, h[i]);
    std::memcpy(out, full, p.digest_length);
}

// ---- 8-way vectorized XOF expansion -------------------------------------
//
// Every BLAKE2X output block of one refill hashes the SAME 64-byte root
// with a parameter block differing only in node_offset's low word — i.e.
// the 64 per-refill blake2b calls share their message schedule and all of
// their initial state except h[1]. One 8-lane u64 vector compression
// therefore produces 8 output blocks for the cost of ~1 scalar one. GCC
// vector extensions lower these to AVX-512 (or 2x AVX2) on this host.

typedef uint64_t u64x8 __attribute__((vector_size(64)));

inline u64x8 bcast8(uint64_t x)
{
    return u64x8{ x, x, x, x, x, x, x, x };
}

inline u64x8 rotr8(u64x8 x, int n)
{
    return (x >> n) | (x << (64 - n));
}

// 8 independent single-block blake2b finals: shared message m[16] and
// shared init words except h[1] (vector). Writes h[0..7] back as vectors.
void compress8_xof(u64x8 h[8], const uint64_t m[16], uint64_t t)
{
    u64x8 v[16];
    for (int i = 0; i < 8; i++) v[i] = h[i];
    for (int i = 0; i < 8; i++) v[8 + i] = bcast8(IV[i]);
    v[12] ^= bcast8(t);
    v[14] = ~v[14];  // single-block: always the last compression

#define G8(r, i, a, b, c, d)                    \
    a = a + b + bcast8(m[SIGMA[r][2 * i]]);     \
    d = rotr8(d ^ a, 32);                       \
    c = c + d;                                  \
    b = rotr8(b ^ c, 24);                       \
    a = a + b + bcast8(m[SIGMA[r][2 * i + 1]]); \
    d = rotr8(d ^ a, 16);                       \
    c = c + d;                                  \
    b = rotr8(b ^ c, 63);

    for (int r = 0; r < 12; r++) {
        G8(r, 0, v[0], v[4], v[8], v[12]);
        G8(r, 1, v[1], v[5], v[9], v[13]);
        G8(r, 2, v[2], v[6], v[10], v[14]);
        G8(r, 3, v[3], v[7], v[11], v[15]);
        G8(r, 4, v[0], v[5], v[10], v[15]);
        G8(r, 5, v[1], v[6], v[11], v[12]);
        G8(r, 6, v[2], v[7], v[8], v[13]);
        G8(r, 7, v[3], v[4], v[9], v[14]);
    }
#undef G8
    for (int i = 0; i < 8; i++) h[i] ^= v[i] ^ v[8 + i];
}

}  // namespace

extern "C" {

// Fill `out` with `n_bytes` of the SEAL blake2xb PRNG stream for `seed`
// (8 x u64), starting at refill counter `counter`. n_bytes must be a
// multiple of 4096 (the reference PRNG buffer size, randomgen.h:391).
// Bit-identical to the pure-Python RFC implementation
// (tests/test_randomgen.py); the XOF expansion runs 8 blocks per vector
// compression.
void sealtpu_blake2xb_stream(const uint64_t seed[8], uint64_t counter,
                             uint8_t *out, size_t n_bytes)
{
    constexpr uint32_t OUTLEN = 4096;
    const uint8_t *key = reinterpret_cast<const uint8_t *>(seed);
    for (size_t off = 0; off < n_bytes; off += OUTLEN, counter++) {
        uint8_t root[64];
        Param rp{ 64, 64, 1, 1, 0, (uint64_t)OUTLEN << 32, 0, 0 };
        uint8_t ctr[8];
        store64(ctr, counter);
        blake2b(rp, key, 64, ctr, 8, root);

        // shared message block: root padded to 128 bytes, t = inlen = 64
        uint64_t m[16];
        for (int i = 0; i < 8; i++) m[i] = load64(root + 8 * i);
        for (int i = 8; i < 16; i++) m[i] = 0;

        uint8_t *dst = out + off;
        for (uint32_t g = 0; g * 64 * 8 < OUTLEN; g++) {
            // pb word 0: digest_length | leaf_length << 32; word 1:
            // node_offset = OUTLEN << 32 | i; word 2: inner_length << 8
            u64x8 h[8];
            h[0] = bcast8(IV[0] ^ (64ULL | (64ULL << 32)));
            u64x8 idx = { 0, 1, 2, 3, 4, 5, 6, 7 };
            h[1] = bcast8(IV[1] ^ ((uint64_t)OUTLEN << 32 | g * 8)) ^ idx;
            h[2] = bcast8(IV[2] ^ (64ULL << 8));
            for (int i = 3; i < 8; i++) h[i] = bcast8(IV[i]);
            compress8_xof(h, m, 64);
            for (int j = 0; j < 8; j++)
                for (int k = 0; k < 8; k++)
                    store64(dst + ((size_t)g * 8 + j) * 64 + 8 * k, h[k][j]);
        }
    }
}

// Centered-binomial noise sampler tail (rlwe.cpp sample_poly_cbd parity;
// mirrors seal_tpu/rlwe.py sample_poly_cbd exactly): 6 stream bytes per
// coefficient, bytes 2 and 5 masked to 5 bits, noise = popcount of the
// first three minus popcount of the last three, lifted per prime.
void sealtpu_cbd(const uint8_t *raw, size_t n, const uint64_t *moduli,
                 size_t L, uint64_t *out)
{
    for (size_t i = 0; i < n; i++) {
        const uint8_t *b = raw + 6 * i;
        const int w = __builtin_popcount(b[0]) + __builtin_popcount(b[1]) +
                      __builtin_popcount(b[2] & 0x1F) -
                      __builtin_popcount(b[3]) - __builtin_popcount(b[4]) -
                      __builtin_popcount(b[5] & 0x1F);
        for (size_t j = 0; j < L; j++)
            out[j * n + i] = w < 0 ? (uint64_t)(w + (int64_t)moduli[j])
                                   : (uint64_t)w;
    }
}

// General blake2b with an arbitrary parameter block (for tests).
void sealtpu_blake2b(const uint8_t *data, size_t datalen,
                     const uint8_t *key, size_t keylen,
                     uint8_t digest_length, uint8_t fanout, uint8_t depth,
                     uint32_t leaf_length, uint64_t node_offset,
                     uint8_t node_depth, uint8_t inner_length, uint8_t *out)
{
    Param p{ digest_length, (uint8_t)keylen, fanout, depth, leaf_length,
             node_offset, node_depth, inner_length };
    blake2b(p, key, keylen, data, datalen, out);
}

}  // extern "C"
