// Native host-side polynomial ops for the keygen/encryption hot path.
//
// The device compute path is jax/XLA/Pallas (u32 limb emulation); key
// generation, however, is defined by byte-exact host PRNG streams and runs
// on the host (SURVEY.md §2.7), where the XLA:CPU limb emulation costs
// ~10x a direct u64 implementation. These are original u64 implementations
// of the Harvey lazy-butterfly negacyclic NTT and the Barrett/Shoup modular
// primitives, value-compatible with seal_tpu/ops/{ntt,limb}.py (and hence
// with the reference's util/dwthandler.h:94-356 + uintarithsmallmod.h) —
// the Python/JAX paths remain the cross-check.
//
// Built together with the other native sources into libsealtpu_native.so
// (see seal_tpu/native/__init__.py).

#include <cstdint>
#include <cstddef>
#include <cstring>

namespace {

static inline uint64_t mulhi64(uint64_t a, uint64_t b)
{
    return (uint64_t)(((unsigned __int128)a * b) >> 64);
}

// x*w mod q in [0, 2q), w < q, wq = floor(w * 2^64 / q)
// (parity: multiply_uint_mod_lazy, uintarithsmallmod.h:313-326)
static inline uint64_t mul_shoup_lazy(uint64_t x, uint64_t w, uint64_t wq,
                                      uint64_t q)
{
    return w * x - mulhi64(x, wq) * q;
}

static inline uint64_t mul_shoup(uint64_t x, uint64_t w, uint64_t wq,
                                 uint64_t q)
{
    uint64_t r = mul_shoup_lazy(x, w, wq, q);
    return r >= q ? r - q : r;
}

// (x_hi·2^64 + x_lo) mod q, (r0, r1) = floor(2^128 / q) words
// (parity: barrett_reduce_128, uintarithsmallmod.h:167-209; mirrors
// seal_tpu/ops/limb.py barrett_reduce_128 exactly)
static inline uint64_t barrett128(uint64_t xlo, uint64_t xhi, uint64_t q,
                                  uint64_t r0, uint64_t r1)
{
    uint64_t carry = mulhi64(xlo, r0);
    unsigned __int128 t = (unsigned __int128)xlo * r1;
    uint64_t tlo = (uint64_t)t, thi = (uint64_t)(t >> 64);
    uint64_t tmp1 = tlo + carry;
    uint64_t tmp3 = thi + (tmp1 < tlo);
    unsigned __int128 u = (unsigned __int128)xhi * r0;
    uint64_t ulo = (uint64_t)u, uhi = (uint64_t)(u >> 64);
    uint64_t tmp1b = tmp1 + ulo;
    uint64_t carry2 = uhi + (tmp1b < tmp1);
    uint64_t quot = xhi * r1 + tmp3 + carry2;
    uint64_t r = xlo - quot * q;
    return r >= q ? r - q : r;
}

// x mod q for 64-bit x via the same floor(2^128/q) words (parity:
// barrett_reduce_64, uintarithsmallmod.h:211-233) — replaces hardware
// division in per-element loops (~25 cycles/div vs ~5 for this)
static inline uint64_t barrett64(uint64_t x, uint64_t q, uint64_t r1)
{
    uint64_t tmp = mulhi64(x, r1);
    uint64_t r = x - tmp * q;
    return r >= q ? r - q : r;
}

}  // namespace

// ---------------------------------------------------------------------------
// AVX-512 Harvey butterflies (8 u64 lanes). Same exact integer arithmetic
// as the scalar path — mulhi via four vpmuludq 32x32 partial products,
// low half via vpmullq, the lazy [0,2q) conditional subtract via vpminuq
// (u >= 2q  <=>  u - 2q did not wrap) — so results are bit-identical; the
// scalar loops below remain for the sub-vector gap tail and non-AVX512
// builds. This is the host-side analogue of the reference's optional HEXL
// AVX-512 NTT (CMakeLists.txt:216-221, util/ntt.cpp:395-458), which this
// sandbox cannot build (network fetch); measured ~3x on the bulk stages.
// ---------------------------------------------------------------------------
#if defined(__AVX512F__) && defined(__AVX512DQ__)
#include <immintrin.h>
#define SEALTPU_AVX512_NTT 1

static inline __m512i mulhi64_v(__m512i x, __m512i y)
{
    const __m512i lo32 = _mm512_set1_epi64((long long)0xFFFFFFFFull);
    const __m512i x1 = _mm512_srli_epi64(x, 32);
    const __m512i y1 = _mm512_srli_epi64(y, 32);
    const __m512i ll = _mm512_mul_epu32(x, y);
    const __m512i hl = _mm512_mul_epu32(x1, y);
    const __m512i lh = _mm512_mul_epu32(x, y1);
    const __m512i hh = _mm512_mul_epu32(x1, y1);
    const __m512i cross = _mm512_add_epi64(
        _mm512_add_epi64(_mm512_srli_epi64(ll, 32),
                         _mm512_and_si512(hl, lo32)),
        _mm512_and_si512(lh, lo32));
    return _mm512_add_epi64(
        _mm512_add_epi64(hh, _mm512_srli_epi64(hl, 32)),
        _mm512_add_epi64(_mm512_srli_epi64(lh, 32),
                         _mm512_srli_epi64(cross, 32)));
}

// w*x - q*floor(x*wq / 2^64) mod 2^64  (result < 2q, Shoup lazy)
static inline __m512i mul_shoup_lazy_v(__m512i x, __m512i w, __m512i wq,
                                       __m512i q)
{
    const __m512i hi = mulhi64_v(x, wq);
    return _mm512_sub_epi64(_mm512_mullo_epi64(x, w),
                            _mm512_mullo_epi64(q, hi));
}

// u (< 4q) -> u mod-ish: subtract 2q when u >= 2q (stay lazy < 2q)
static inline __m512i csub2q_v(__m512i u, __m512i two_q)
{
    return _mm512_min_epu64(u, _mm512_sub_epi64(u, two_q));
}

// full-reduce Shoup multiply (mul_shoup parity)
static inline __m512i mul_shoup_v(__m512i x, __m512i w, __m512i wq,
                                  __m512i q)
{
    const __m512i r = mul_shoup_lazy_v(x, w, wq, q);
    return _mm512_min_epu64(r, _mm512_sub_epi64(r, q));
}

// barrett64 parity: x (any u64) -> canonical mod q
static inline __m512i barrett64_v(__m512i x, __m512i q, __m512i r1)
{
    const __m512i tmp = mulhi64_v(x, r1);
    const __m512i r = _mm512_sub_epi64(x, _mm512_mullo_epi64(tmp, q));
    return _mm512_min_epu64(r, _mm512_sub_epi64(r, q));
}

// barrett128 parity ((xhi:xlo) mod q with r0/r1 = floor(2^128/q) words):
// the same add/carry schedule as the scalar helper, lane-wise.
static inline __m512i barrett128_v(__m512i xlo, __m512i xhi, __m512i q,
                                   __m512i r0, __m512i r1)
{
    const __m512i one = _mm512_set1_epi64(1);
    const __m512i carry = mulhi64_v(xlo, r0);
    const __m512i tlo = _mm512_mullo_epi64(xlo, r1);
    const __m512i thi = mulhi64_v(xlo, r1);
    const __m512i tmp1 = _mm512_add_epi64(tlo, carry);
    const __mmask8 c1 = _mm512_cmplt_epu64_mask(tmp1, tlo);
    const __m512i tmp3 = _mm512_mask_add_epi64(thi, c1, thi, one);
    const __m512i ulo = _mm512_mullo_epi64(xhi, r0);
    const __m512i uhi = mulhi64_v(xhi, r0);
    const __m512i tmp1b = _mm512_add_epi64(tmp1, ulo);
    const __mmask8 c2 = _mm512_cmplt_epu64_mask(tmp1b, tmp1);
    const __m512i carry2 = _mm512_mask_add_epi64(uhi, c2, uhi, one);
    const __m512i quot = _mm512_add_epi64(
        _mm512_add_epi64(_mm512_mullo_epi64(xhi, r1), tmp3), carry2);
    const __m512i r = _mm512_sub_epi64(xlo, _mm512_mullo_epi64(quot, q));
    return _mm512_min_epu64(r, _mm512_sub_epi64(r, q));
}


// ---------------------------------------------------------------------------
// Batch-lane kernels: 8 polynomials in the 8 u64 lanes of one zmm vector.
// The _many entry points transpose groups of 8 same-tower polys into a
// column-major scratch ([n][8]), run the NTT/DWT with EVERY butterfly a
// full 8-lane vector (roots broadcast once per block — no small-gap tail,
// no per-j shuffle overhead), and transpose back. Bit-identical per lane
// to the scalar kernels (exact integer ops; doubles use explicit
// mul/add/sub — no FMA contraction, matching -ffp-contract=off).
// This is the structural advantage of the batch-amortized host APIs over
// a per-call C++ library: an 8-wide NTT the reference cannot express.
// ---------------------------------------------------------------------------

static inline void transpose8x8_u64(const __m512i r[8], __m512i o[8])
{
    const __m512i t0 = _mm512_unpacklo_epi64(r[0], r[1]);
    const __m512i t1 = _mm512_unpackhi_epi64(r[0], r[1]);
    const __m512i t2 = _mm512_unpacklo_epi64(r[2], r[3]);
    const __m512i t3 = _mm512_unpackhi_epi64(r[2], r[3]);
    const __m512i t4 = _mm512_unpacklo_epi64(r[4], r[5]);
    const __m512i t5 = _mm512_unpackhi_epi64(r[4], r[5]);
    const __m512i t6 = _mm512_unpacklo_epi64(r[6], r[7]);
    const __m512i t7 = _mm512_unpackhi_epi64(r[6], r[7]);
    const __m512i v0 = _mm512_shuffle_i64x2(t0, t2, 0x88);
    const __m512i v1 = _mm512_shuffle_i64x2(t0, t2, 0xDD);
    const __m512i v2 = _mm512_shuffle_i64x2(t1, t3, 0x88);
    const __m512i v3 = _mm512_shuffle_i64x2(t1, t3, 0xDD);
    const __m512i v4 = _mm512_shuffle_i64x2(t4, t6, 0x88);
    const __m512i v5 = _mm512_shuffle_i64x2(t4, t6, 0xDD);
    const __m512i v6 = _mm512_shuffle_i64x2(t5, t7, 0x88);
    const __m512i v7 = _mm512_shuffle_i64x2(t5, t7, 0xDD);
    o[0] = _mm512_shuffle_i64x2(v0, v4, 0x88);
    o[4] = _mm512_shuffle_i64x2(v0, v4, 0xDD);
    o[2] = _mm512_shuffle_i64x2(v1, v5, 0x88);
    o[6] = _mm512_shuffle_i64x2(v1, v5, 0xDD);
    o[1] = _mm512_shuffle_i64x2(v2, v6, 0x88);
    o[5] = _mm512_shuffle_i64x2(v2, v6, 0xDD);
    o[3] = _mm512_shuffle_i64x2(v3, v7, 0x88);
    o[7] = _mm512_shuffle_i64x2(v3, v7, 0xDD);
}

// rows[k][i] (8 strided polys) -> cols[i*8 + k]
static void lanes8_pack(uint64_t *const rows[8], size_t n, uint64_t *cols)
{
    __m512i r[8], o[8];
    for (size_t i = 0; i < n; i += 8) {
        for (int k = 0; k < 8; k++)
            r[k] = _mm512_loadu_si512(rows[k] + i);
        transpose8x8_u64(r, o);
        for (int t = 0; t < 8; t++)
            _mm512_storeu_si512(cols + (i + t) * 8, o[t]);
    }
}

static void lanes8_unpack(const uint64_t *cols, size_t n,
                          uint64_t *const rows[8])
{
    __m512i r[8], o[8];
    for (size_t i = 0; i < n; i += 8) {
        for (int t = 0; t < 8; t++)
            r[t] = _mm512_loadu_si512(cols + (i + t) * 8);
        transpose8x8_u64(r, o);
        for (int k = 0; k < 8; k++)
            _mm512_storeu_si512(rows[k] + i, o[k]);
    }
}

// forward NTT over cols[n][8] (8 polys in lanes), one prime's tables
static void ntt_fwd_lanes8(uint64_t *cols, size_t log_n, const uint64_t *op,
                           const uint64_t *qt, uint64_t q, int lazy)
{
    const size_t n = (size_t)1 << log_n;
    const __m512i qv = _mm512_set1_epi64((long long)q);
    const __m512i tqv = _mm512_set1_epi64((long long)(2 * q));
    for (size_t s = 0; s < log_n; s++) {
        const size_t m = (size_t)1 << s;
        const size_t gap = n >> (s + 1);
        for (size_t j = 0; j < m; j++) {
            const __m512i wv = _mm512_set1_epi64((long long)op[m + j]);
            const __m512i wqv = _mm512_set1_epi64((long long)qt[m + j]);
            uint64_t *p0 = cols + j * 2 * gap * 8;
            uint64_t *p1 = p0 + gap * 8;
            size_t i = 0;
            for (; i + 2 <= gap; i += 2) {   // 2x unroll: two chains in flight
                __m512i u0 = csub2q_v(_mm512_loadu_si512(p0 + i * 8), tqv);
                __m512i u1 = csub2q_v(
                    _mm512_loadu_si512(p0 + i * 8 + 8), tqv);
                const __m512i x0 = _mm512_loadu_si512(p1 + i * 8);
                const __m512i x1 = _mm512_loadu_si512(p1 + i * 8 + 8);
                const __m512i t0 = mul_shoup_lazy_v(x0, wv, wqv, qv);
                const __m512i t1 = mul_shoup_lazy_v(x1, wv, wqv, qv);
                _mm512_storeu_si512(p0 + i * 8, _mm512_add_epi64(u0, t0));
                _mm512_storeu_si512(p0 + i * 8 + 8,
                                    _mm512_add_epi64(u1, t1));
                _mm512_storeu_si512(
                    p1 + i * 8,
                    _mm512_sub_epi64(_mm512_add_epi64(u0, tqv), t0));
                _mm512_storeu_si512(
                    p1 + i * 8 + 8,
                    _mm512_sub_epi64(_mm512_add_epi64(u1, tqv), t1));
            }
            for (; i < gap; i++) {
                __m512i u = _mm512_loadu_si512(p0 + i * 8);
                u = csub2q_v(u, tqv);
                const __m512i xv = _mm512_loadu_si512(p1 + i * 8);
                const __m512i t = mul_shoup_lazy_v(xv, wv, wqv, qv);
                _mm512_storeu_si512(p0 + i * 8, _mm512_add_epi64(u, t));
                _mm512_storeu_si512(
                    p1 + i * 8,
                    _mm512_sub_epi64(_mm512_add_epi64(u, tqv), t));
            }
        }
    }
    if (!lazy) {
        for (size_t i = 0; i < n; i++) {
            __m512i v = _mm512_loadu_si512(cols + i * 8);
            v = _mm512_min_epu64(v, _mm512_sub_epi64(v, tqv));
            v = _mm512_min_epu64(v, _mm512_sub_epi64(v, qv));
            _mm512_storeu_si512(cols + i * 8, v);
        }
    }
}

static void ntt_inv_lanes8(uint64_t *cols, size_t log_n, const uint64_t *op,
                           const uint64_t *qt, uint64_t in_op, uint64_t in_qt,
                           uint64_t la_op, uint64_t la_qt, uint64_t q,
                           int lazy)
{
    const size_t n = (size_t)1 << log_n;
    const __m512i qv = _mm512_set1_epi64((long long)q);
    const __m512i tqv = _mm512_set1_epi64((long long)(2 * q));
    size_t offset = 1;
    for (size_t s = log_n - 1; s >= 1; s--) {
        const size_t m = (size_t)1 << s;
        const size_t gap = n >> (s + 1);
        for (size_t j = 0; j < m; j++) {
            const __m512i wv = _mm512_set1_epi64((long long)op[offset + j]);
            const __m512i wqv = _mm512_set1_epi64((long long)qt[offset + j]);
            uint64_t *p0 = cols + j * 2 * gap * 8;
            uint64_t *p1 = p0 + gap * 8;
            for (size_t i = 0; i < gap; i++) {
                const __m512i u = _mm512_loadu_si512(p0 + i * 8);
                const __m512i v = _mm512_loadu_si512(p1 + i * 8);
                _mm512_storeu_si512(
                    p0 + i * 8, csub2q_v(_mm512_add_epi64(u, v), tqv));
                const __m512i d = _mm512_sub_epi64(
                    _mm512_add_epi64(u, tqv), v);
                _mm512_storeu_si512(p1 + i * 8,
                                    mul_shoup_lazy_v(d, wv, wqv, qv));
            }
        }
        offset += m;
    }
    {
        const size_t gap = n >> 1;
        const __m512i inov = _mm512_set1_epi64((long long)in_op);
        const __m512i inqv = _mm512_set1_epi64((long long)in_qt);
        const __m512i laov = _mm512_set1_epi64((long long)la_op);
        const __m512i laqv = _mm512_set1_epi64((long long)la_qt);
        for (size_t i = 0; i < gap; i++) {
            __m512i u = _mm512_loadu_si512(cols + i * 8);
            u = csub2q_v(u, tqv);
            const __m512i v = _mm512_loadu_si512(cols + (i + gap) * 8);
            const __m512i s0 = csub2q_v(_mm512_add_epi64(u, v), tqv);
            _mm512_storeu_si512(cols + i * 8,
                                mul_shoup_lazy_v(s0, inov, inqv, qv));
            const __m512i d = _mm512_sub_epi64(
                _mm512_add_epi64(u, tqv), v);
            _mm512_storeu_si512(cols + (i + gap) * 8,
                                mul_shoup_lazy_v(d, laov, laqv, qv));
        }
    }
    if (!lazy) {
        for (size_t i = 0; i < n; i++) {
            __m512i v = _mm512_loadu_si512(cols + i * 8);
            v = _mm512_min_epu64(v, _mm512_sub_epi64(v, qv));
            _mm512_storeu_si512(cols + i * 8, v);
        }
    }
}

// 32-bit-modulus batch-lane kernels (q < 2^30): every value fits 32 bits,
// so the Shoup multiply is three single-uop vpmuludq (exact 32x32->64
// products) with a 2^32-based quotient wq32 = wq64 >> 32 (exactly
// floor(w*2^32/q)). Lazy intermediates differ from the 2^64-Shoup path by
// a multiple of q, but every non-lazy output is canonical (< q) and
// therefore bit-identical; _many entry points only select this kernel for
// full-reduce calls. Range: t = w*x - q*floor(x*wq32/2^32) < 2q for
// x < 4q when 4q < 2^32. This accelerates every BatchEncoder transform
// (20-bit plain modulus) and the small-n coefficient towers.
static inline __m512i mul_shoup_lazy32_v(__m512i x, __m512i w,
                                         __m512i wq32, __m512i q)
{
    const __m512i hi = _mm512_srli_epi64(_mm512_mul_epu32(x, wq32), 32);
    return _mm512_sub_epi64(_mm512_mul_epu32(w, x),
                            _mm512_mul_epu32(q, hi));
}

static void ntt_fwd_lanes8_q32(uint64_t *cols, size_t log_n,
                               const uint64_t *op, const uint64_t *qt,
                               uint64_t q)
{
    const size_t n = (size_t)1 << log_n;
    const __m512i qv = _mm512_set1_epi64((long long)q);
    const __m512i tqv = _mm512_set1_epi64((long long)(2 * q));
    for (size_t s = 0; s < log_n; s++) {
        const size_t m = (size_t)1 << s;
        const size_t gap = n >> (s + 1);
        for (size_t j = 0; j < m; j++) {
            const __m512i wv = _mm512_set1_epi64((long long)op[m + j]);
            const __m512i wqv = _mm512_set1_epi64(
                (long long)(qt[m + j] >> 32));
            uint64_t *p0 = cols + j * 2 * gap * 8;
            uint64_t *p1 = p0 + gap * 8;
            size_t i = 0;
            for (; i + 2 <= gap; i += 2) {
                __m512i u0 = csub2q_v(_mm512_loadu_si512(p0 + i * 8), tqv);
                __m512i u1 = csub2q_v(
                    _mm512_loadu_si512(p0 + i * 8 + 8), tqv);
                const __m512i x0 = _mm512_loadu_si512(p1 + i * 8);
                const __m512i x1 = _mm512_loadu_si512(p1 + i * 8 + 8);
                const __m512i t0 = mul_shoup_lazy32_v(x0, wv, wqv, qv);
                const __m512i t1 = mul_shoup_lazy32_v(x1, wv, wqv, qv);
                _mm512_storeu_si512(p0 + i * 8, _mm512_add_epi64(u0, t0));
                _mm512_storeu_si512(p0 + i * 8 + 8,
                                    _mm512_add_epi64(u1, t1));
                _mm512_storeu_si512(
                    p1 + i * 8,
                    _mm512_sub_epi64(_mm512_add_epi64(u0, tqv), t0));
                _mm512_storeu_si512(
                    p1 + i * 8 + 8,
                    _mm512_sub_epi64(_mm512_add_epi64(u1, tqv), t1));
            }
            for (; i < gap; i++) {
                __m512i u = csub2q_v(_mm512_loadu_si512(p0 + i * 8), tqv);
                const __m512i xv = _mm512_loadu_si512(p1 + i * 8);
                const __m512i t = mul_shoup_lazy32_v(xv, wv, wqv, qv);
                _mm512_storeu_si512(p0 + i * 8, _mm512_add_epi64(u, t));
                _mm512_storeu_si512(
                    p1 + i * 8,
                    _mm512_sub_epi64(_mm512_add_epi64(u, tqv), t));
            }
        }
    }
    for (size_t i = 0; i < n; i++) {
        __m512i v = _mm512_loadu_si512(cols + i * 8);
        v = _mm512_min_epu64(v, _mm512_sub_epi64(v, tqv));
        v = _mm512_min_epu64(v, _mm512_sub_epi64(v, qv));
        _mm512_storeu_si512(cols + i * 8, v);
    }
}

static void ntt_inv_lanes8_q32(uint64_t *cols, size_t log_n,
                               const uint64_t *op, const uint64_t *qt,
                               uint64_t in_op, uint64_t in_qt,
                               uint64_t la_op, uint64_t la_qt, uint64_t q)
{
    const size_t n = (size_t)1 << log_n;
    const __m512i qv = _mm512_set1_epi64((long long)q);
    const __m512i tqv = _mm512_set1_epi64((long long)(2 * q));
    size_t offset = 1;
    for (size_t s = log_n - 1; s >= 1; s--) {
        const size_t m = (size_t)1 << s;
        const size_t gap = n >> (s + 1);
        for (size_t j = 0; j < m; j++) {
            const __m512i wv = _mm512_set1_epi64((long long)op[offset + j]);
            const __m512i wqv = _mm512_set1_epi64(
                (long long)(qt[offset + j] >> 32));
            uint64_t *p0 = cols + j * 2 * gap * 8;
            uint64_t *p1 = p0 + gap * 8;
            size_t i = 0;
            for (; i + 2 <= gap; i += 2) {
                const __m512i u0 = _mm512_loadu_si512(p0 + i * 8);
                const __m512i u1 = _mm512_loadu_si512(p0 + i * 8 + 8);
                const __m512i v0 = _mm512_loadu_si512(p1 + i * 8);
                const __m512i v1 = _mm512_loadu_si512(p1 + i * 8 + 8);
                _mm512_storeu_si512(
                    p0 + i * 8, csub2q_v(_mm512_add_epi64(u0, v0), tqv));
                _mm512_storeu_si512(
                    p0 + i * 8 + 8,
                    csub2q_v(_mm512_add_epi64(u1, v1), tqv));
                const __m512i d0 = _mm512_sub_epi64(
                    _mm512_add_epi64(u0, tqv), v0);
                const __m512i d1 = _mm512_sub_epi64(
                    _mm512_add_epi64(u1, tqv), v1);
                _mm512_storeu_si512(p1 + i * 8,
                                    mul_shoup_lazy32_v(d0, wv, wqv, qv));
                _mm512_storeu_si512(p1 + i * 8 + 8,
                                    mul_shoup_lazy32_v(d1, wv, wqv, qv));
            }
            for (; i < gap; i++) {
                const __m512i u = _mm512_loadu_si512(p0 + i * 8);
                const __m512i v = _mm512_loadu_si512(p1 + i * 8);
                _mm512_storeu_si512(
                    p0 + i * 8, csub2q_v(_mm512_add_epi64(u, v), tqv));
                const __m512i d = _mm512_sub_epi64(
                    _mm512_add_epi64(u, tqv), v);
                _mm512_storeu_si512(p1 + i * 8,
                                    mul_shoup_lazy32_v(d, wv, wqv, qv));
            }
        }
        offset += m;
    }
    {
        const size_t gap = n >> 1;
        const __m512i inov = _mm512_set1_epi64((long long)in_op);
        const __m512i inqv = _mm512_set1_epi64((long long)(in_qt >> 32));
        const __m512i laov = _mm512_set1_epi64((long long)la_op);
        const __m512i laqv = _mm512_set1_epi64((long long)(la_qt >> 32));
        for (size_t i = 0; i < gap; i++) {
            __m512i u = csub2q_v(_mm512_loadu_si512(cols + i * 8), tqv);
            const __m512i v = _mm512_loadu_si512(cols + (i + gap) * 8);
            const __m512i s0 = csub2q_v(_mm512_add_epi64(u, v), tqv);
            _mm512_storeu_si512(cols + i * 8,
                                mul_shoup_lazy32_v(s0, inov, inqv, qv));
            const __m512i d = _mm512_sub_epi64(
                _mm512_add_epi64(u, tqv), v);
            _mm512_storeu_si512(cols + (i + gap) * 8,
                                mul_shoup_lazy32_v(d, laov, laqv, qv));
        }
    }
    for (size_t i = 0; i < n; i++) {
        __m512i v = _mm512_loadu_si512(cols + i * 8);
        v = _mm512_min_epu64(v, _mm512_sub_epi64(v, qv));
        _mm512_storeu_si512(cols + i * 8, v);
    }
}

// Batch-lane complex-double DWT (CKKS encoder FFT): 8 ciphertexts in the
// 8 double lanes; explicit mul/add/sub intrinsics (no FMA) keep each
// lane's rounding identical to the scalar -ffp-contract=off build.
static void dwt_from_rev_lanes8(double *re, double *im, size_t log_n,
                                const double *r_re, const double *r_im,
                                int use_scalar, double scalar)
{
    const size_t n = (size_t)1 << log_n;
    size_t gap = 1, m = n >> 1, ridx = 1;
    for (; m > 1; m >>= 1) {
        size_t offset = 0;
        for (size_t i = 0; i < m; i++) {
            const __m512d wr = _mm512_set1_pd(r_re[ridx]);
            const __m512d wi = _mm512_set1_pd(r_im[ridx]);
            ridx++;
            double *xr = re + offset * 8, *xi = im + offset * 8;
            double *yr = xr + gap * 8, *yi = xi + gap * 8;
            size_t j = 0;
            for (; j + 2 <= gap; j += 2) {   // 2 chains in flight
                const __m512d ur0 = _mm512_loadu_pd(xr + j * 8);
                const __m512d ui0 = _mm512_loadu_pd(xi + j * 8);
                const __m512d vr0 = _mm512_loadu_pd(yr + j * 8);
                const __m512d vi0 = _mm512_loadu_pd(yi + j * 8);
                const __m512d ur1 = _mm512_loadu_pd(xr + j * 8 + 8);
                const __m512d ui1 = _mm512_loadu_pd(xi + j * 8 + 8);
                const __m512d vr1 = _mm512_loadu_pd(yr + j * 8 + 8);
                const __m512d vi1 = _mm512_loadu_pd(yi + j * 8 + 8);
                _mm512_storeu_pd(xr + j * 8, _mm512_add_pd(ur0, vr0));
                _mm512_storeu_pd(xi + j * 8, _mm512_add_pd(ui0, vi0));
                _mm512_storeu_pd(xr + j * 8 + 8, _mm512_add_pd(ur1, vr1));
                _mm512_storeu_pd(xi + j * 8 + 8, _mm512_add_pd(ui1, vi1));
                const __m512d sr0 = _mm512_sub_pd(ur0, vr0);
                const __m512d si0 = _mm512_sub_pd(ui0, vi0);
                const __m512d sr1 = _mm512_sub_pd(ur1, vr1);
                const __m512d si1 = _mm512_sub_pd(ui1, vi1);
                _mm512_storeu_pd(
                    yr + j * 8, _mm512_sub_pd(_mm512_mul_pd(sr0, wr),
                                              _mm512_mul_pd(si0, wi)));
                _mm512_storeu_pd(
                    yi + j * 8, _mm512_add_pd(_mm512_mul_pd(sr0, wi),
                                              _mm512_mul_pd(si0, wr)));
                _mm512_storeu_pd(
                    yr + j * 8 + 8, _mm512_sub_pd(_mm512_mul_pd(sr1, wr),
                                                  _mm512_mul_pd(si1, wi)));
                _mm512_storeu_pd(
                    yi + j * 8 + 8, _mm512_add_pd(_mm512_mul_pd(sr1, wi),
                                                  _mm512_mul_pd(si1, wr)));
            }
            for (; j < gap; j++) {
                const __m512d ur = _mm512_loadu_pd(xr + j * 8);
                const __m512d ui = _mm512_loadu_pd(xi + j * 8);
                const __m512d vr = _mm512_loadu_pd(yr + j * 8);
                const __m512d vi = _mm512_loadu_pd(yi + j * 8);
                _mm512_storeu_pd(xr + j * 8, _mm512_add_pd(ur, vr));
                _mm512_storeu_pd(xi + j * 8, _mm512_add_pd(ui, vi));
                const __m512d sr = _mm512_sub_pd(ur, vr);
                const __m512d si = _mm512_sub_pd(ui, vi);
                _mm512_storeu_pd(
                    yr + j * 8, _mm512_sub_pd(_mm512_mul_pd(sr, wr),
                                              _mm512_mul_pd(si, wi)));
                _mm512_storeu_pd(
                    yi + j * 8, _mm512_add_pd(_mm512_mul_pd(sr, wi),
                                              _mm512_mul_pd(si, wr)));
            }
            offset += gap << 1;
        }
        gap <<= 1;
    }
    const double wr0 = r_re[ridx], wi0 = r_im[ridx];
    double *xr = re, *xi = im, *yr = re + gap * 8, *yi = im + gap * 8;
    if (use_scalar) {
        const __m512d sc = _mm512_set1_pd(scalar);
        const __m512d swr = _mm512_set1_pd(wr0 * scalar);
        const __m512d swi = _mm512_set1_pd(wi0 * scalar);
        for (size_t j = 0; j < gap; j++) {
            const __m512d ur = _mm512_loadu_pd(xr + j * 8);
            const __m512d ui = _mm512_loadu_pd(xi + j * 8);
            const __m512d vr = _mm512_loadu_pd(yr + j * 8);
            const __m512d vi = _mm512_loadu_pd(yi + j * 8);
            _mm512_storeu_pd(
                xr + j * 8, _mm512_mul_pd(_mm512_add_pd(ur, vr), sc));
            _mm512_storeu_pd(
                xi + j * 8, _mm512_mul_pd(_mm512_add_pd(ui, vi), sc));
            const __m512d sr = _mm512_sub_pd(ur, vr);
            const __m512d si = _mm512_sub_pd(ui, vi);
            _mm512_storeu_pd(
                yr + j * 8, _mm512_sub_pd(_mm512_mul_pd(sr, swr),
                                          _mm512_mul_pd(si, swi)));
            _mm512_storeu_pd(
                yi + j * 8, _mm512_add_pd(_mm512_mul_pd(sr, swi),
                                          _mm512_mul_pd(si, swr)));
        }
    } else {
        const __m512d wr = _mm512_set1_pd(wr0);
        const __m512d wi = _mm512_set1_pd(wi0);
        for (size_t j = 0; j < gap; j++) {
            const __m512d ur = _mm512_loadu_pd(xr + j * 8);
            const __m512d ui = _mm512_loadu_pd(xi + j * 8);
            const __m512d vr = _mm512_loadu_pd(yr + j * 8);
            const __m512d vi = _mm512_loadu_pd(yi + j * 8);
            _mm512_storeu_pd(xr + j * 8, _mm512_add_pd(ur, vr));
            _mm512_storeu_pd(xi + j * 8, _mm512_add_pd(ui, vi));
            const __m512d sr = _mm512_sub_pd(ur, vr);
            const __m512d si = _mm512_sub_pd(ui, vi);
            _mm512_storeu_pd(
                yr + j * 8, _mm512_sub_pd(_mm512_mul_pd(sr, wr),
                                          _mm512_mul_pd(si, wi)));
            _mm512_storeu_pd(
                yi + j * 8, _mm512_add_pd(_mm512_mul_pd(sr, wi),
                                          _mm512_mul_pd(si, wr)));
        }
    }
}

static void dwt_to_rev_lanes8(double *re, double *im, size_t log_n,
                              const double *r_re, const double *r_im,
                              int use_scalar, double scalar)
{
    const size_t n = (size_t)1 << log_n;
    size_t gap = n >> 1, m = 1, ridx = 1;
    for (; m < (n >> 1); m <<= 1) {
        size_t offset = 0;
        for (size_t i = 0; i < m; i++) {
            const __m512d wr = _mm512_set1_pd(r_re[ridx]);
            const __m512d wi = _mm512_set1_pd(r_im[ridx]);
            ridx++;
            double *xr = re + offset * 8, *xi = im + offset * 8;
            double *yr = xr + gap * 8, *yi = xi + gap * 8;
            size_t j = 0;
            for (; j + 2 <= gap; j += 2) {   // 2 chains in flight
                const __m512d vr0 = _mm512_loadu_pd(yr + j * 8);
                const __m512d vi0 = _mm512_loadu_pd(yi + j * 8);
                const __m512d vr1 = _mm512_loadu_pd(yr + j * 8 + 8);
                const __m512d vi1 = _mm512_loadu_pd(yi + j * 8 + 8);
                const __m512d pr0 = _mm512_sub_pd(_mm512_mul_pd(vr0, wr),
                                                  _mm512_mul_pd(vi0, wi));
                const __m512d pi0 = _mm512_add_pd(_mm512_mul_pd(vr0, wi),
                                                  _mm512_mul_pd(vi0, wr));
                const __m512d pr1 = _mm512_sub_pd(_mm512_mul_pd(vr1, wr),
                                                  _mm512_mul_pd(vi1, wi));
                const __m512d pi1 = _mm512_add_pd(_mm512_mul_pd(vr1, wi),
                                                  _mm512_mul_pd(vi1, wr));
                const __m512d ur0 = _mm512_loadu_pd(xr + j * 8);
                const __m512d ui0 = _mm512_loadu_pd(xi + j * 8);
                const __m512d ur1 = _mm512_loadu_pd(xr + j * 8 + 8);
                const __m512d ui1 = _mm512_loadu_pd(xi + j * 8 + 8);
                _mm512_storeu_pd(xr + j * 8, _mm512_add_pd(ur0, pr0));
                _mm512_storeu_pd(xi + j * 8, _mm512_add_pd(ui0, pi0));
                _mm512_storeu_pd(yr + j * 8, _mm512_sub_pd(ur0, pr0));
                _mm512_storeu_pd(yi + j * 8, _mm512_sub_pd(ui0, pi0));
                _mm512_storeu_pd(xr + j * 8 + 8, _mm512_add_pd(ur1, pr1));
                _mm512_storeu_pd(xi + j * 8 + 8, _mm512_add_pd(ui1, pi1));
                _mm512_storeu_pd(yr + j * 8 + 8, _mm512_sub_pd(ur1, pr1));
                _mm512_storeu_pd(yi + j * 8 + 8, _mm512_sub_pd(ui1, pi1));
            }
            for (; j < gap; j++) {
                const __m512d ur = _mm512_loadu_pd(xr + j * 8);
                const __m512d ui = _mm512_loadu_pd(xi + j * 8);
                const __m512d vr = _mm512_loadu_pd(yr + j * 8);
                const __m512d vi = _mm512_loadu_pd(yi + j * 8);
                const __m512d pr = _mm512_sub_pd(_mm512_mul_pd(vr, wr),
                                                 _mm512_mul_pd(vi, wi));
                const __m512d pi = _mm512_add_pd(_mm512_mul_pd(vr, wi),
                                                 _mm512_mul_pd(vi, wr));
                _mm512_storeu_pd(xr + j * 8, _mm512_add_pd(ur, pr));
                _mm512_storeu_pd(xi + j * 8, _mm512_add_pd(ui, pi));
                _mm512_storeu_pd(yr + j * 8, _mm512_sub_pd(ur, pr));
                _mm512_storeu_pd(yi + j * 8, _mm512_sub_pd(ui, pi));
            }
            offset += gap << 1;
        }
        gap >>= 1;
    }
    for (size_t i = 0; i < m; i++) {
        const double wr0 = r_re[ridx], wi0 = r_im[ridx];
        ridx++;
        double *xr = re + 2 * i * 8, *xi = im + 2 * i * 8;
        __m512d ur = _mm512_loadu_pd(xr);
        __m512d ui = _mm512_loadu_pd(xi);
        const __m512d vr = _mm512_loadu_pd(xr + 8);
        const __m512d vi = _mm512_loadu_pd(xi + 8);
        __m512d pr, pi;
        if (use_scalar) {
            const __m512d sc = _mm512_set1_pd(scalar);
            const __m512d swr = _mm512_set1_pd(wr0 * scalar);
            const __m512d swi = _mm512_set1_pd(wi0 * scalar);
            ur = _mm512_mul_pd(ur, sc);
            ui = _mm512_mul_pd(ui, sc);
            pr = _mm512_sub_pd(_mm512_mul_pd(vr, swr),
                               _mm512_mul_pd(vi, swi));
            pi = _mm512_add_pd(_mm512_mul_pd(vr, swi),
                               _mm512_mul_pd(vi, swr));
        } else {
            const __m512d wr = _mm512_set1_pd(wr0);
            const __m512d wi = _mm512_set1_pd(wi0);
            pr = _mm512_sub_pd(_mm512_mul_pd(vr, wr),
                               _mm512_mul_pd(vi, wi));
            pi = _mm512_add_pd(_mm512_mul_pd(vr, wi),
                               _mm512_mul_pd(vi, wr));
        }
        _mm512_storeu_pd(xr, _mm512_add_pd(ur, pr));
        _mm512_storeu_pd(xi, _mm512_add_pd(ui, pi));
        _mm512_storeu_pd(xr + 8, _mm512_sub_pd(ur, pr));
        _mm512_storeu_pd(xi + 8, _mm512_sub_pd(ui, pi));
    }
}

// scratch for the column-major lanes ([n][8] u64 / doubles x2)
static __thread uint64_t *g_lanes_buf = nullptr;
static __thread size_t g_lanes_cap = 0;

static uint64_t *lanes_scratch(size_t words)
{
    if (g_lanes_cap < words) {
        delete[] g_lanes_buf;
        g_lanes_buf = new uint64_t[words];
        g_lanes_cap = words;
    }
    return g_lanes_buf;
}

#endif

extern "C" {

// Forward negacyclic NTT over [L, n] u64 coefficients, in place.
// w_op/w_qt: [L, n] root powers at bitrev index + Shoup quotients
// (ops/ntt.py build_ntt_tables layout). Values enter < 4q (canonical < q);
// output < q, or < 4q when lazy != 0.
void sealtpu_ntt_forward(uint64_t *x, size_t L, size_t log_n,
                         const uint64_t *w_op, const uint64_t *w_qt,
                         const uint64_t *moduli, int lazy)
{
    const size_t n = (size_t)1 << log_n;
    for (size_t l = 0; l < L; l++) {
        uint64_t *xl = x + l * n;
        const uint64_t *op = w_op + l * n;
        const uint64_t *qt = w_qt + l * n;
        const uint64_t q = moduli[l], two_q = 2 * q;
        for (size_t s = 0; s < log_n; s++) {
            const size_t m = (size_t)1 << s;
            const size_t gap = n >> (s + 1);
            for (size_t j = 0; j < m; j++) {
                const uint64_t w = op[m + j], wq = qt[m + j];
                uint64_t *p0 = xl + j * 2 * gap;
                uint64_t *p1 = p0 + gap;
                for (size_t i = 0; i < gap; i++) {
                    uint64_t u = p0[i];
                    if (u >= two_q) u -= two_q;
                    const uint64_t v = mul_shoup_lazy(p1[i], w, wq, q);
                    p0[i] = u + v;
                    p1[i] = u + two_q - v;
                }
            }
        }
        if (!lazy) {
            for (size_t i = 0; i < n; i++) {
                uint64_t v = xl[i];
                if (v >= two_q) v -= two_q;
                if (v >= q) v -= q;
                xl[i] = v;
            }
        }
    }
}

// Inverse negacyclic NTT, in place; n^{-1} folded into the last stage
// (ops/ntt.py ntt_inverse layout: inv tables consumed sequentially from
// offset 1; inv_n/last scalars per prime). Output < q (< 2q when lazy).
void sealtpu_ntt_inverse(uint64_t *x, size_t L, size_t log_n,
                         const uint64_t *w_op, const uint64_t *w_qt,
                         const uint64_t *inv_n_op, const uint64_t *inv_n_qt,
                         const uint64_t *last_op, const uint64_t *last_qt,
                         const uint64_t *moduli, int lazy)
{
    const size_t n = (size_t)1 << log_n;
    for (size_t l = 0; l < L; l++) {
        uint64_t *xl = x + l * n;
        const uint64_t *op = w_op + l * n;
        const uint64_t *qt = w_qt + l * n;
        const uint64_t q = moduli[l], two_q = 2 * q;
        size_t offset = 1;
        for (size_t s = log_n - 1; s >= 1; s--) {
            const size_t m = (size_t)1 << s;
            const size_t gap = n >> (s + 1);
            for (size_t j = 0; j < m; j++) {
                const uint64_t w = op[offset + j], wq = qt[offset + j];
                uint64_t *p0 = xl + j * 2 * gap;
                uint64_t *p1 = p0 + gap;
                for (size_t i = 0; i < gap; i++) {
                    const uint64_t u = p0[i], v = p1[i];
                    uint64_t y0 = u + v;
                    if (y0 >= two_q) y0 -= two_q;
                    p0[i] = y0;
                    p1[i] = mul_shoup_lazy(u + two_q - v, w, wq, q);
                }
            }
            offset += m;
        }
        // last stage (m = 1, gap = n/2): inv_n on x0, root*inv_n on x1
        {
            const size_t gap = n >> 1;
            const uint64_t in_op = inv_n_op[l], in_qt = inv_n_qt[l];
            const uint64_t la_op = last_op[l], la_qt = last_qt[l];
            for (size_t i = 0; i < gap; i++) {
                uint64_t u = xl[i];
                if (u >= two_q) u -= two_q;
                const uint64_t v = xl[i + gap];
                uint64_t s0 = u + v;
                if (s0 >= two_q) s0 -= two_q;
                xl[i] = mul_shoup_lazy(s0, in_op, in_qt, q);
                xl[i + gap] = mul_shoup_lazy(u + two_q - v, la_op, la_qt, q);
            }
        }
        if (!lazy) {
            for (size_t i = 0; i < n; i++) {
                if (xl[i] >= q) xl[i] -= q;
            }
        }
    }
}

// out = -(a*s + e) mod q over [L, n]; a, s, e < q; (r0, r1) = Barrett
// ratios per prime. The encrypt-zero c0 math (rlwe.cpp:497-527 parity,
// mirrors the _ezs_ntt_jit body in seal_tpu/rlwe.py).
void sealtpu_keygen_c0(const uint64_t *a, const uint64_t *s,
                       const uint64_t *e, uint64_t *out, size_t L, size_t n,
                       const uint64_t *moduli, const uint64_t *r0s,
                       const uint64_t *r1s)
{
    for (size_t l = 0; l < L; l++) {
        const uint64_t q = moduli[l], r0 = r0s[l], r1 = r1s[l];
        const uint64_t *al = a + l * n, *sl = s + l * n, *el = e + l * n;
        uint64_t *ol = out + l * n;
        for (size_t i = 0; i < n; i++) {
            const unsigned __int128 p = (unsigned __int128)al[i] * sl[i];
            uint64_t r = barrett128((uint64_t)p, (uint64_t)(p >> 64), q, r0, r1);
            r += el[i];
            if (r >= q) r -= q;
            ol[i] = r ? q - r : 0;
        }
    }
}

// x[l] *= scalar[l] mod q (Shoup, full reduce), in place over [L, n]
// (BGV noise t-scaling; multiply_poly_scalar_coeffmod parity).
void sealtpu_mul_scalar_shoup(uint64_t *x, size_t L, size_t n,
                              const uint64_t *s_op, const uint64_t *s_qt,
                              const uint64_t *moduli)
{
    for (size_t l = 0; l < L; l++) {
        const uint64_t w = s_op[l], wq = s_qt[l], q = moduli[l];
        uint64_t *xl = x + l * n;
        for (size_t i = 0; i < n; i++) xl[i] = mul_shoup(xl[i], w, wq, q);
    }
}

// Whole BFV {t, gamma} decrypt tail in ONE native call (rns.cpp:1133-1201
// parity; r4 — the previous five-call pipeline spent more in ctypes
// dispatch than in arithmetic at small n): scale the phase rows by the
// combined (prod_t_gamma * qhat_inv) constant, base-convert to {t, gamma},
// apply -q^{-1} on each, then the gamma-centering correction and the final
// gamma^{-1} mod t multiply.
void sealtpu_bfv_decrypt_tail(
    const uint64_t *phase, size_t Li, size_t n,
    const uint64_t *s_op, const uint64_t *s_qt, const uint64_t *q,
    const uint64_t *M, const uint64_t *tg, const uint64_t *tg_r0,
    const uint64_t *tg_r1, const uint64_t *neg_op, const uint64_t *neg_qt,
    uint64_t t, uint64_t gamma, uint64_t inv_g_op, uint64_t inv_g_qt,
    uint64_t *scratch /* [Li, n] */, uint64_t *out /* [n] */)
{
    for (size_t l = 0; l < Li; l++) {
        const uint64_t w = s_op[l], wq = s_qt[l], ql = q[l];
        const uint64_t *pl = phase + l * n;
        uint64_t *xl = scratch + l * n;
        for (size_t i = 0; i < n; i++) xl[i] = mul_shoup(pl[i], w, wq, ql);
    }
    const uint64_t half_g = gamma >> 1;
    const uint64_t *Mt = M, *Mg = M + Li;
    size_t i0 = 0;
#ifdef SEALTPU_AVX512_NTT
    {
        // vectorized {t, gamma} correction — 8 coefficients per iteration
        // with the exact scalar schedule per lane (the scalar loop below
        // was ~60% of the whole small-n BFV decrypt)
        const __m512i one = _mm512_set1_epi64(1);
        const __m512i tv_q = _mm512_set1_epi64((long long)tg[0]);
        const __m512i tv_r0 = _mm512_set1_epi64((long long)tg_r0[0]);
        const __m512i tv_r1 = _mm512_set1_epi64((long long)tg_r1[0]);
        const __m512i gv_q = _mm512_set1_epi64((long long)tg[1]);
        const __m512i gv_r0 = _mm512_set1_epi64((long long)tg_r0[1]);
        const __m512i gv_r1 = _mm512_set1_epi64((long long)tg_r1[1]);
        const __m512i n0_op = _mm512_set1_epi64((long long)neg_op[0]);
        const __m512i n0_qt = _mm512_set1_epi64((long long)neg_qt[0]);
        const __m512i n1_op = _mm512_set1_epi64((long long)neg_op[1]);
        const __m512i n1_qt = _mm512_set1_epi64((long long)neg_qt[1]);
        const __m512i tv_t = _mm512_set1_epi64((long long)t);
        const __m512i gv_g = _mm512_set1_epi64((long long)gamma);
        const __m512i hg = _mm512_set1_epi64((long long)half_g);
        const __m512i ig_op = _mm512_set1_epi64((long long)inv_g_op);
        const __m512i ig_qt = _mm512_set1_epi64((long long)inv_g_qt);
        for (; i0 + 8 <= n; i0 += 8) {
            __m512i at_lo = _mm512_setzero_si512();
            __m512i at_hi = _mm512_setzero_si512();
            __m512i ag_lo = _mm512_setzero_si512();
            __m512i ag_hi = _mm512_setzero_si512();
            for (size_t j = 0; j < Li; j++) {
                const __m512i x = _mm512_loadu_si512(scratch + j * n + i0);
                const __m512i mt = _mm512_set1_epi64((long long)Mt[j]);
                const __m512i mg = _mm512_set1_epi64((long long)Mg[j]);
                __m512i plo = _mm512_mullo_epi64(x, mt);
                __m512i phi = mulhi64_v(x, mt);
                at_lo = _mm512_add_epi64(at_lo, plo);
                at_hi = _mm512_add_epi64(
                    at_hi, _mm512_mask_add_epi64(
                        phi, _mm512_cmplt_epu64_mask(at_lo, plo), phi,
                        one));
                plo = _mm512_mullo_epi64(x, mg);
                phi = mulhi64_v(x, mg);
                ag_lo = _mm512_add_epi64(ag_lo, plo);
                ag_hi = _mm512_add_epi64(
                    ag_hi, _mm512_mask_add_epi64(
                        phi, _mm512_cmplt_epu64_mask(ag_lo, plo), phi,
                        one));
            }
            __m512i tv = barrett128_v(at_lo, at_hi, tv_q, tv_r0, tv_r1);
            __m512i gv = barrett128_v(ag_lo, ag_hi, gv_q, gv_r0, gv_r1);
            tv = mul_shoup_v(tv, n0_op, n0_qt, tv_t);
            gv = mul_shoup_v(gv, n1_op, n1_qt, gv_g);
            const __mmask8 hi_half = _mm512_cmpgt_epu64_mask(gv, hg);
            const __m512i d_hi = _mm512_add_epi64(
                tv, barrett64_v(_mm512_sub_epi64(gv_g, gv), tv_t, tv_r1));
            const __m512i d_lo = _mm512_add_epi64(
                tv, _mm512_sub_epi64(tv_t,
                                     barrett64_v(gv, tv_t, tv_r1)));
            __m512i d = _mm512_mask_blend_epi64(hi_half, d_lo, d_hi);
            d = _mm512_min_epu64(d, _mm512_sub_epi64(d, tv_t));
            _mm512_storeu_si512(out + i0,
                                mul_shoup_v(d, ig_op, ig_qt, tv_t));
        }
    }
#endif
    for (size_t i = i0; i < n; i++) {
        unsigned __int128 at = 0, ag = 0;
        for (size_t j = 0; j < Li; j++) {
            at += (unsigned __int128)scratch[j * n + i] * Mt[j];
            ag += (unsigned __int128)scratch[j * n + i] * Mg[j];
        }
        uint64_t tv = barrett128((uint64_t)at, (uint64_t)(at >> 64), tg[0],
                                 tg_r0[0], tg_r1[0]);
        uint64_t gv = barrett128((uint64_t)ag, (uint64_t)(ag >> 64), tg[1],
                                 tg_r0[1], tg_r1[1]);
        tv = mul_shoup(tv, neg_op[0], neg_qt[0], t);
        gv = mul_shoup(gv, neg_op[1], neg_qt[1], gamma);
        // Barrett instead of hardware % (same canonical residues; the raw
        // divisions were ~40% of the whole n=1024 decrypt)
        uint64_t d;
        if (gv > half_g) {
            d = tv + barrett64(gamma - gv, t, tg_r1[0]);
        } else {
            d = tv + (t - barrett64(gv, t, tg_r1[0]));
        }
        if (d >= t) d -= t;
        out[i] = mul_shoup(d, inv_g_op, inv_g_qt, t);
    }
}

// Fused size-2 decrypt phase: out = INTT(NTT(c1) . s) + c0 over [L, n]
// (decryptor.cpp:126/249 parity for the common size-2 ciphertext; one
// native call instead of four).
void sealtpu_phase2(const uint64_t *c0, const uint64_t *c1,
                    const uint64_t *sk_ntt, size_t L, size_t n,
                    size_t log_n,
                    const uint64_t *fwd_op, const uint64_t *fwd_qt,
                    const uint64_t *inv_op, const uint64_t *inv_qt,
                    const uint64_t *inv_n_op, const uint64_t *inv_n_qt,
                    const uint64_t *last_op, const uint64_t *last_qt,
                    const uint64_t *moduli, const uint64_t *r0s,
                    const uint64_t *r1s, int ntt_form, uint64_t *out)
{
    std::memcpy(out, c1, L * n * sizeof(uint64_t));
    if (!ntt_form)
        sealtpu_ntt_forward(out, L, log_n, fwd_op, fwd_qt, moduli, 1);
    for (size_t l = 0; l < L; l++) {
        const uint64_t q = moduli[l], r0 = r0s[l], r1 = r1s[l];
        const uint64_t *sl = sk_ntt + l * n;
        uint64_t *ol = out + l * n;
        for (size_t i = 0; i < n; i++) {
            const unsigned __int128 p = (unsigned __int128)ol[i] * sl[i];
            ol[i] = barrett128((uint64_t)p, (uint64_t)(p >> 64), q, r0, r1);
        }
    }
    if (!ntt_form)
        sealtpu_ntt_inverse(out, L, log_n, inv_op, inv_qt, inv_n_op,
                            inv_n_qt, last_op, last_qt, moduli, 0);
    for (size_t l = 0; l < L; l++) {
        const uint64_t q = moduli[l];
        const uint64_t *cl = c0 + l * n;
        uint64_t *ol = out + l * n;
        for (size_t i = 0; i < n; i++) {
            uint64_t r = ol[i] + cl[i];
            if (r >= q) r -= q;
            ol[i] = r;
        }
    }
}

// Complex-double DWT butterflies — the CKKS encoder FFT (dwthandler.h:94-356
// parity; same operation order as utils/dwt.py's vectorized replay, so the
// output is bit-identical to the reference's encoder BUTTERFLY-FOR-BUTTERFLY.
// The build passes -ffp-contract=off: FMA contraction would change the
// complex-multiply rounding and break bit-exactness.
void sealtpu_dwt_from_rev(double *re, double *im, size_t log_n,
                          const double *r_re, const double *r_im,
                          int use_scalar, double scalar)
{
    const size_t n = (size_t)1 << log_n;
    size_t gap = 1, m = n >> 1, ridx = 1;
    for (; m > 1; m >>= 1) {
        size_t offset = 0;
        for (size_t i = 0; i < m; i++) {
            const double wr = r_re[ridx], wi = r_im[ridx];
            ridx++;
            double *xr = re + offset, *xi = im + offset;
            double *yr = xr + gap, *yi = xi + gap;
            for (size_t j = 0; j < gap; j++) {
                const double ur = xr[j], ui = xi[j];
                const double vr = yr[j], vi = yi[j];
                xr[j] = ur + vr;
                xi[j] = ui + vi;
                const double sr = ur - vr, si = ui - vi;
                yr[j] = sr * wr - si * wi;
                yi[j] = sr * wi + si * wr;
            }
            offset += gap << 1;
        }
        gap <<= 1;
    }
    const double wr0 = r_re[ridx], wi0 = r_im[ridx];
    double *xr = re, *xi = im, *yr = re + gap, *yi = im + gap;
    if (use_scalar) {
        const double swr = wr0 * scalar, swi = wi0 * scalar;
        for (size_t j = 0; j < gap; j++) {
            const double ur = xr[j], ui = xi[j];
            const double vr = yr[j], vi = yi[j];
            xr[j] = (ur + vr) * scalar;
            xi[j] = (ui + vi) * scalar;
            const double sr = ur - vr, si = ui - vi;
            yr[j] = sr * swr - si * swi;
            yi[j] = sr * swi + si * swr;
        }
    } else {
        for (size_t j = 0; j < gap; j++) {
            const double ur = xr[j], ui = xi[j];
            const double vr = yr[j], vi = yi[j];
            xr[j] = ur + vr;
            xi[j] = ui + vi;
            const double sr = ur - vr, si = ui - vi;
            yr[j] = sr * wr0 - si * wi0;
            yi[j] = sr * wi0 + si * wr0;
        }
    }
}

void sealtpu_dwt_to_rev(double *re, double *im, size_t log_n,
                        const double *r_re, const double *r_im,
                        int use_scalar, double scalar)
{
    const size_t n = (size_t)1 << log_n;
    size_t gap = n >> 1, m = 1, ridx = 1;
    for (; m < (n >> 1); m <<= 1) {
        size_t offset = 0;
        for (size_t i = 0; i < m; i++) {
            const double wr = r_re[ridx], wi = r_im[ridx];
            ridx++;
            double *xr = re + offset, *xi = im + offset;
            double *yr = xr + gap, *yi = xi + gap;
            for (size_t j = 0; j < gap; j++) {
                const double ur = xr[j], ui = xi[j];
                const double pr = yr[j] * wr - yi[j] * wi;
                const double pi = yr[j] * wi + yi[j] * wr;
                xr[j] = ur + pr;
                xi[j] = ui + pi;
                yr[j] = ur - pr;
                yi[j] = ui - pi;
            }
            offset += gap << 1;
        }
        gap >>= 1;
    }
    // final stage: m = n/2 adjacent pairs, one root each
    for (size_t i = 0; i < m; i++) {
        const double wr = r_re[ridx], wi = r_im[ridx];
        ridx++;
        double *xr = re + 2 * i, *xi = im + 2 * i;
        double ur = xr[0], ui = xi[0];
        double pr, pi;
        if (use_scalar) {
            const double swr = wr * scalar, swi = wi * scalar;
            ur = ur * scalar;
            ui = ui * scalar;
            pr = xr[1] * swr - xi[1] * swi;
            pi = xr[1] * swi + xi[1] * swr;
        } else {
            pr = xr[1] * wr - xi[1] * wi;
            pi = xr[1] * wi + xi[1] * wr;
        }
        xr[0] = ur + pr;
        xi[0] = ui + pi;
        xr[1] = ur - pr;
        xi[1] = ui - pi;
    }
}

// Whole size-2 BFV decrypt in ONE native call: phase (NTT(c1).s -> INTT ->
// +c0) then the {t,gamma} tail — the per-call Python/ctypes glue of the
// two-call split dominated n=1024 decrypt (BASELINE.md host-API rows).
void sealtpu_bfv_decrypt2(
    const uint64_t *c0, const uint64_t *c1, const uint64_t *sk_ntt,
    size_t L, size_t n, size_t log_n,
    const uint64_t *fwd_op, const uint64_t *fwd_qt,
    const uint64_t *inv_op, const uint64_t *inv_qt,
    const uint64_t *inv_n_op, const uint64_t *inv_n_qt,
    const uint64_t *last_op, const uint64_t *last_qt,
    const uint64_t *moduli, const uint64_t *r0s, const uint64_t *r1s,
    const uint64_t *s_op, const uint64_t *s_qt,
    const uint64_t *M, const uint64_t *tg, const uint64_t *tg_r0,
    const uint64_t *tg_r1, const uint64_t *neg_op, const uint64_t *neg_qt,
    uint64_t t, uint64_t gamma, uint64_t inv_g_op, uint64_t inv_g_qt,
    uint64_t *phase_scratch /* [L, n] */, uint64_t *tail_scratch /* [L, n] */,
    uint64_t *out /* [n] */)
{
    sealtpu_phase2(c0, c1, sk_ntt, L, n, log_n, fwd_op, fwd_qt, inv_op,
                   inv_qt, inv_n_op, inv_n_qt, last_op, last_qt, moduli,
                   r0s, r1s, 0, phase_scratch);
    sealtpu_bfv_decrypt_tail(phase_scratch, L, n, s_op, s_qt, moduli, M, tg,
                             tg_r0, tg_r1, neg_op, neg_qt, t, gamma,
                             inv_g_op, inv_g_qt, tail_scratch, out);
}

// Plan-handle variant: the 33-argument sealtpu_bfv_decrypt2 spends ~8 us
// per call on ctypes argument marshaling at small n. The plan snapshots
// every constant pointer once (the Python side keeps the arrays alive);
// per-decrypt calls pass only the 4 varying pointers.
struct BfvDecryptPlan {
    size_t L, n, log_n;
    const uint64_t *fwd_op, *fwd_qt, *inv_op, *inv_qt;
    const uint64_t *inv_n_op, *inv_n_qt, *last_op, *last_qt;
    const uint64_t *moduli, *r0s, *r1s;
    const uint64_t *s_op, *s_qt, *M, *tg, *tg_r0, *tg_r1, *neg_op, *neg_qt;
    uint64_t t, gamma, inv_g_op, inv_g_qt;
    uint64_t *phase_scratch, *tail_scratch;
};

void *sealtpu_bfv_plan_create(
    size_t L, size_t n, size_t log_n,
    const uint64_t *fwd_op, const uint64_t *fwd_qt,
    const uint64_t *inv_op, const uint64_t *inv_qt,
    const uint64_t *inv_n_op, const uint64_t *inv_n_qt,
    const uint64_t *last_op, const uint64_t *last_qt,
    const uint64_t *moduli, const uint64_t *r0s, const uint64_t *r1s,
    const uint64_t *s_op, const uint64_t *s_qt,
    const uint64_t *M, const uint64_t *tg, const uint64_t *tg_r0,
    const uint64_t *tg_r1, const uint64_t *neg_op, const uint64_t *neg_qt,
    uint64_t t, uint64_t gamma, uint64_t inv_g_op, uint64_t inv_g_qt,
    uint64_t *phase_scratch, uint64_t *tail_scratch)
{
    BfvDecryptPlan *p = new BfvDecryptPlan();
    p->L = L; p->n = n; p->log_n = log_n;
    p->fwd_op = fwd_op; p->fwd_qt = fwd_qt;
    p->inv_op = inv_op; p->inv_qt = inv_qt;
    p->inv_n_op = inv_n_op; p->inv_n_qt = inv_n_qt;
    p->last_op = last_op; p->last_qt = last_qt;
    p->moduli = moduli; p->r0s = r0s; p->r1s = r1s;
    p->s_op = s_op; p->s_qt = s_qt; p->M = M; p->tg = tg;
    p->tg_r0 = tg_r0; p->tg_r1 = tg_r1;
    p->neg_op = neg_op; p->neg_qt = neg_qt;
    p->t = t; p->gamma = gamma;
    p->inv_g_op = inv_g_op; p->inv_g_qt = inv_g_qt;
    p->phase_scratch = phase_scratch; p->tail_scratch = tail_scratch;
    return p;
}

void sealtpu_plan_free(void *plan)
{
    delete static_cast<BfvDecryptPlan *>(plan);
}

void sealtpu_bfv_decrypt_plan(void *plan, const uint64_t *c0,
                              const uint64_t *c1, const uint64_t *sk_ntt,
                              uint64_t *out)
{
    const BfvDecryptPlan *p = static_cast<BfvDecryptPlan *>(plan);
    sealtpu_phase2(c0, c1, sk_ntt, p->L, p->n, p->log_n, p->fwd_op,
                   p->fwd_qt, p->inv_op, p->inv_qt, p->inv_n_op, p->inv_n_qt,
                   p->last_op, p->last_qt, p->moduli, p->r0s, p->r1s, 0,
                   p->phase_scratch);
    sealtpu_bfv_decrypt_tail(p->phase_scratch, p->L, p->n, p->s_op, p->s_qt,
                             p->moduli, p->M, p->tg, p->tg_r0, p->tg_r1,
                             p->neg_op, p->neg_qt, p->t, p->gamma,
                             p->inv_g_op, p->inv_g_qt, p->tail_scratch, out);
}

// Signed-coefficient RNS decompose (ckks.h:527-619 fast path): out[l,i] =
// v[i] mod q_l with negate_uint_mod for negatives — Barrett instead of the
// numpy int64 hardware division that dominated large-n CKKS encode.
void sealtpu_reduce_signed_rows(const int64_t *v, size_t n, size_t L,
                                const uint64_t *q, const uint64_t *r1s,
                                uint64_t *out)
{
    for (size_t l = 0; l < L; l++) {
        const uint64_t ql = q[l], r1 = r1s[l];
        uint64_t *ol = out + l * n;
        for (size_t i = 0; i < n; i++) {
            const int64_t s = v[i];
            const uint64_t a = (uint64_t)(s < 0 ? -s : s);
            uint64_t r = barrett64(a, ql, r1);
            if (s < 0 && r) r = ql - r;
            ol[i] = r;
        }
    }
}

// One-call BatchEncoder transforms (batchencoder.cpp:110-149 parity): the
// Python glue (zeros + fancy scatter + wrapper) previously cost as much as
// the INTT at small n. v holds the already-validated residues mod t.
void sealtpu_batch_encode(const uint64_t *v, size_t count, size_t n,
                          const int64_t *index_map, size_t log_n,
                          const uint64_t *inv_op, const uint64_t *inv_qt,
                          const uint64_t *inv_n_op, const uint64_t *inv_n_qt,
                          const uint64_t *last_op, const uint64_t *last_qt,
                          const uint64_t *t_mod, uint64_t *out)
{
    std::memset(out, 0, n * sizeof(uint64_t));
    for (size_t i = 0; i < count; i++) out[index_map[i]] = v[i];
    sealtpu_ntt_inverse(out, 1, log_n, inv_op, inv_qt, inv_n_op, inv_n_qt,
                        last_op, last_qt, t_mod, 0);
}

void sealtpu_batch_decode(const uint64_t *data, size_t count, size_t n,
                          const int64_t *index_map, size_t log_n,
                          const uint64_t *fwd_op, const uint64_t *fwd_qt,
                          const uint64_t *t_mod, uint64_t *scratch,
                          uint64_t *out)
{
    std::memset(scratch, 0, n * sizeof(uint64_t));
    std::memcpy(scratch, data, count * sizeof(uint64_t));
    sealtpu_ntt_forward(scratch, 1, log_n, fwd_op, fwd_qt, t_mod, 0);
    for (size_t i = 0; i < n; i++) out[i] = scratch[index_map[i]];
}

// BFV {t, gamma} decrypt correction tail in ONE pass (rns.cpp:1170-1201
// parity; replaces six numpy passes + a scalar multiply): given the
// neg-scaled (t, gamma) rows, apply the gamma-centering correction and the
// final gamma^{-1} mod t Shoup multiply.
void sealtpu_bfv_tg_correct(const uint64_t *t_row, const uint64_t *g_row,
                            size_t n, uint64_t t, uint64_t gamma,
                            uint64_t inv_g_op, uint64_t inv_g_qt,
                            uint64_t *out)
{
    const uint64_t half_g = gamma >> 1;
    for (size_t i = 0; i < n; i++) {
        uint64_t tv = t_row[i], gv = g_row[i], d;
        if (gv > half_g)
            d = (tv + (gamma - gv) % t) % t;
        else
            d = (tv + (t - gv % t)) % t;
        out[i] = mul_shoup(d, inv_g_op, inv_g_qt, t);
    }
}

// c0[l] += key[l] * f[l] mod q, in place over [L, n] — the kswitch-key
// absorb (keygenerator.cpp:752-765 parity). Rows with f = 0 are exact
// no-ops (0-factor Shoup multiply yields 0).
void sealtpu_absorb(uint64_t *c0, const uint64_t *key, size_t L, size_t n,
                    const uint64_t *f_op, const uint64_t *f_qt,
                    const uint64_t *moduli)
{
    for (size_t l = 0; l < L; l++) {
        const uint64_t w = f_op[l], wq = f_qt[l], q = moduli[l];
        if (w == 0) continue;
        uint64_t *cl = c0 + l * n;
        const uint64_t *kl = key + l * n;
        for (size_t i = 0; i < n; i++) {
            uint64_t t = mul_shoup(kl[i], w, wq, q);
            uint64_t r = cl[i] + t;
            if (r >= q) r -= q;
            cl[i] = r;
        }
    }
}

// out = a*b mod q over [L, n] (NTT-domain dyadic product).
void sealtpu_dyadic_mul(const uint64_t *a, const uint64_t *b, uint64_t *out,
                        size_t L, size_t n, const uint64_t *moduli,
                        const uint64_t *r0s, const uint64_t *r1s)
{
    for (size_t l = 0; l < L; l++) {
        const uint64_t q = moduli[l], r0 = r0s[l], r1 = r1s[l];
        const uint64_t *al = a + l * n, *bl = b + l * n;
        uint64_t *ol = out + l * n;
        for (size_t i = 0; i < n; i++) {
            const unsigned __int128 p = (unsigned __int128)al[i] * bl[i];
            ol[i] = barrett128((uint64_t)p, (uint64_t)(p >> 64), q, r0, r1);
        }
    }
}

// a = (a + b) mod q in place over [L, n]; both < q.
void sealtpu_add_inplace(uint64_t *a, const uint64_t *b, size_t L, size_t n,
                         const uint64_t *moduli)
{
    for (size_t l = 0; l < L; l++) {
        const uint64_t q = moduli[l];
        uint64_t *al = a + l * n;
        const uint64_t *bl = b + l * n;
        for (size_t i = 0; i < n; i++) {
            uint64_t r = al[i] + bl[i];
            if (r >= q) r -= q;
            al[i] = r;
        }
    }
}

// a = -(a + b) mod q in place over [L, n]; both < q (0 stays 0).
void sealtpu_add_neg_inplace(uint64_t *a, const uint64_t *b, size_t L,
                             size_t n, const uint64_t *moduli)
{
    for (size_t l = 0; l < L; l++) {
        const uint64_t q = moduli[l];
        uint64_t *al = a + l * n;
        const uint64_t *bl = b + l * n;
        for (size_t i = 0; i < n; i++) {
            uint64_t r = al[i] + bl[i];
            if (r >= q) r -= q;
            al[i] = r ? q - r : 0;
        }
    }
}

// Fast-base-conversion dot: out[o, i] = (Σ_j xhat[j, i]·M[o, j]) mod p_o,
// 128-bit wrapping accumulation exactly like ops/rns.py _matrix_dot
// (rns.cpp:418-463 parity). xhat are the scaled residues (< q_j).
void sealtpu_base_convert_dot(const uint64_t *xhat, size_t Li, size_t n,
                              const uint64_t *M, size_t Lo,
                              const uint64_t *p, const uint64_t *pr0,
                              const uint64_t *pr1, uint64_t *out)
{
    for (size_t o = 0; o < Lo; o++) {
        const uint64_t po = p[o], r0 = pr0[o], r1 = pr1[o];
        const uint64_t *Mo = M + o * Li;
        uint64_t *oo = out + o * n;
        for (size_t i = 0; i < n; i++) {
            unsigned __int128 acc = 0;
            for (size_t j = 0; j < Li; j++)
                acc += (unsigned __int128)xhat[j * n + i] * Mo[j];
            oo[i] = barrett128((uint64_t)acc, (uint64_t)(acc >> 64), po,
                               r0, r1);
        }
    }
}

// The CT-RSA 2019 v-correction of the exact base conversion
// (rns.cpp:465-539; ops/rns.py exact_convert_parts): v[i] = floor((Σ_j
// xhat[j,i]·floor(2^128/q_j) + 2^127) / 2^128), then out = (dot - v·q_mod_p)
// mod p for the single output prime.
void sealtpu_exact_convert_fix(const uint64_t *xhat, size_t Li, size_t n,
                               const uint64_t *ratio_lo,
                               const uint64_t *ratio_hi, uint64_t *dot,
                               uint64_t q_mod_p, uint64_t p, uint64_t pr0,
                               uint64_t pr1)
{
    const unsigned __int128 HALF = (unsigned __int128)1 << 127;
    for (size_t i = 0; i < n; i++) {
        // 192-bit accumulator: u128 low half (bits 0..127) + u64 high
        unsigned __int128 acc_lo = 0;
        uint64_t acc_hi = 0;
        for (size_t j = 0; j < Li; j++) {
            const uint64_t x = xhat[j * n + i];
            const unsigned __int128 lo = (unsigned __int128)x * ratio_lo[j];
            const unsigned __int128 hi = (unsigned __int128)x * ratio_hi[j];
            // term = lo + (hi << 64), bits 0..191
            const unsigned __int128 t_low =
                lo + ((unsigned __int128)(uint64_t)hi << 64);
            const uint64_t c0 = t_low < lo;
            acc_lo += t_low;
            const uint64_t c1 = acc_lo < t_low;
            acc_hi += (uint64_t)(hi >> 64) + c0 + c1;
        }
        acc_lo += HALF;
        acc_hi += acc_lo < HALF;
        const uint64_t v = acc_hi;  // bits 128..191 (v <= Li)
        const uint64_t vq = (uint64_t)(
            ((unsigned __int128)v * q_mod_p) % p);
        uint64_t r = dot[i] + p - vq;
        if (r >= p) r -= p;
        dot[i] = r;
        (void)pr0;
        (void)pr1;
    }
}

// BFV plaintext scaling: out[j, i] = (delta[j]*m_i + fix_i) mod q_j with
// fix_i = floor((q_mod_t*m_i + half_t)/t) (util/scalingvariant.cpp:69-113
// parity; mirrors encryptor.py _scaled_plain_rows). m beyond m_count is 0.
void sealtpu_scaled_plain(const uint64_t *m, size_t m_count, size_t L,
                          size_t n, const uint64_t *moduli,
                          const uint64_t *delta, uint64_t q_mod_t,
                          uint64_t half_t, uint64_t t, uint64_t *out)
{
    for (size_t i = 0; i < m_count && i < n; i++) {
        const uint64_t mi = m[i];
        if (!mi) continue;
        const uint64_t fix = (uint64_t)(
            ((unsigned __int128)q_mod_t * mi + half_t) / t);
        for (size_t j = 0; j < L; j++) {
            out[j * n + i] = (uint64_t)(
                (((unsigned __int128)delta[j] * mi) + fix) % moduli[j]);
        }
    }
}

// Split u64 values into (lo, hi) u32 limb arrays — the host->device
// boundary conversion (dtypes.to_device hot path; one pass instead of
// numpy's mask/shift/astype chain).
void sealtpu_split_u32(const uint64_t *src, size_t count, uint32_t *lo,
                       uint32_t *hi)
{
    for (size_t i = 0; i < count; i++) {
        lo[i] = (uint32_t)src[i];
        hi[i] = (uint32_t)(src[i] >> 32);
    }
}

// Merge (lo, hi) u32 limb arrays back into u64 (dtypes.to_host).
void sealtpu_merge_u64(const uint32_t *lo, const uint32_t *hi, size_t count,
                       uint64_t *dst)
{
    for (size_t i = 0; i < count; i++) {
        dst[i] = (uint64_t)lo[i] | ((uint64_t)hi[i] << 32);
    }
}

// NTT table build for one prime (ops/ntt.py build_ntt_tables parity):
// fwd[bitrev(i)] = root^i, inv[bitrev(i-1)+1] = inv_root^i (fwd[0] =
// inv[0] = 1), plus floor(v·2^64/q) Shoup quotients for both. `root` is
// the minimal primitive 2n-th root (host-verified); scalars (n^{-1},
// folded last root) stay in Python.
void sealtpu_build_ntt_tables(size_t log_n, uint64_t q, uint64_t root,
                              uint64_t inv_root, uint64_t *fwd_op,
                              uint64_t *fwd_qt, uint64_t *inv_op,
                              uint64_t *inv_qt)
{
    const size_t n = (size_t)1 << log_n;
    // power = root^i via sequential 128-bit mulmod (exact)
    uint64_t power = root;
    fwd_op[0] = 1;
    for (size_t i = 1; i < n; i++) {
        // bitrev(i)
        size_t r = 0, v = i;
        for (size_t b = 0; b < log_n; b++) {
            r = (r << 1) | (v & 1);
            v >>= 1;
        }
        fwd_op[r] = power;
        power = (uint64_t)(((unsigned __int128)power * root) % q);
    }
    power = inv_root;
    inv_op[0] = 1;
    for (size_t i = 1; i < n; i++) {
        size_t r = 0, v = i - 1;
        for (size_t b = 0; b < log_n; b++) {
            r = (r << 1) | (v & 1);
            v >>= 1;
        }
        inv_op[r + 1] = power;
        power = (uint64_t)(((unsigned __int128)power * inv_root) % q);
    }
    for (size_t i = 0; i < n; i++) {
        fwd_qt[i] = (uint64_t)(((unsigned __int128)fwd_op[i] << 64) / q);
        inv_qt[i] = (uint64_t)(((unsigned __int128)inv_op[i] << 64) / q);
    }
}

// ---------------------------------------------------------------------------
// Batched (_many) entry points: B polynomials/ciphertexts sharing one
// tower's tables, ONE Python<->native crossing for the whole batch. These
// amortize the fixed per-call interpreter/ctypes cost that dominates the
// small-n host-API rows (BASELINE.md "Fair-measurement note"); each is a
// thin outer loop over the exact single-call kernels above, so batch
// results are bit-identical to B sequential calls.
// ---------------------------------------------------------------------------

void sealtpu_ntt_forward_many(uint64_t *x, size_t B, size_t L, size_t log_n,
                              const uint64_t *w_op, const uint64_t *w_qt,
                              const uint64_t *moduli, int lazy)
{
    const size_t n = (size_t)1 << log_n;
    const size_t stride = L << log_n;
#ifdef SEALTPU_AVX512_NTT
    if (log_n >= 3) {
        // groups of 8 same-prime rows ride the batch-lane kernel
        uint64_t *cols = lanes_scratch(n * 8);
        for (size_t l = 0; l < L; l++) {
            size_t b = 0;
            for (; b + 8 <= B; b += 8) {
                uint64_t *rows[8];
                for (int k = 0; k < 8; k++)
                    rows[k] = x + (b + k) * stride + l * n;
                lanes8_pack(rows, n, cols);
                if (!lazy && moduli[l] < ((uint64_t)1 << 30))
                    ntt_fwd_lanes8_q32(cols, log_n, w_op + l * n,
                                       w_qt + l * n, moduli[l]);
                else
                    ntt_fwd_lanes8(cols, log_n, w_op + l * n, w_qt + l * n,
                                   moduli[l], lazy);
                lanes8_unpack(cols, n, rows);
            }
            for (; b < B; b++)
                sealtpu_ntt_forward(x + b * stride + l * n, 1, log_n,
                                    w_op + l * n, w_qt + l * n,
                                    moduli + l, lazy);
        }
        return;
    }
#endif
    for (size_t b = 0; b < B; b++)
        sealtpu_ntt_forward(x + b * stride, L, log_n, w_op, w_qt, moduli,
                            lazy);
}

void sealtpu_ntt_inverse_many(uint64_t *x, size_t B, size_t L, size_t log_n,
                              const uint64_t *w_op, const uint64_t *w_qt,
                              const uint64_t *inv_n_op,
                              const uint64_t *inv_n_qt,
                              const uint64_t *last_op,
                              const uint64_t *last_qt,
                              const uint64_t *moduli, int lazy)
{
    const size_t n = (size_t)1 << log_n;
    const size_t stride = L << log_n;
#ifdef SEALTPU_AVX512_NTT
    if (log_n >= 3) {
        uint64_t *cols = lanes_scratch(n * 8);
        for (size_t l = 0; l < L; l++) {
            size_t b = 0;
            for (; b + 8 <= B; b += 8) {
                uint64_t *rows[8];
                for (int k = 0; k < 8; k++)
                    rows[k] = x + (b + k) * stride + l * n;
                lanes8_pack(rows, n, cols);
                if (!lazy && moduli[l] < ((uint64_t)1 << 30))
                    ntt_inv_lanes8_q32(cols, log_n, w_op + l * n,
                                       w_qt + l * n, inv_n_op[l],
                                       inv_n_qt[l], last_op[l],
                                       last_qt[l], moduli[l]);
                else
                    ntt_inv_lanes8(cols, log_n, w_op + l * n, w_qt + l * n,
                                   inv_n_op[l], inv_n_qt[l], last_op[l],
                                   last_qt[l], moduli[l], lazy);
                lanes8_unpack(cols, n, rows);
            }
            for (; b < B; b++)
                sealtpu_ntt_inverse(x + b * stride + l * n, 1, log_n,
                                    w_op + l * n, w_qt + l * n,
                                    inv_n_op + l, inv_n_qt + l,
                                    last_op + l, last_qt + l,
                                    moduli + l, lazy);
        }
        return;
    }
#endif
    for (size_t b = 0; b < B; b++)
        sealtpu_ntt_inverse(x + b * stride, L, log_n, w_op, w_qt, inv_n_op,
                            inv_n_qt, last_op, last_qt, moduli, lazy);
}

// out[b] = -(a[b]*s + e[b]) with a SHARED second operand s [L, n] (the
// secret key): the symmetric encrypt-zero c0 for B ciphertexts.
void sealtpu_keygen_c0_many(const uint64_t *a, const uint64_t *s,
                            const uint64_t *e, uint64_t *out, size_t B,
                            size_t L, size_t n, const uint64_t *moduli,
                            const uint64_t *r0s, const uint64_t *r1s)
{
    const size_t stride = L * n;
    for (size_t b = 0; b < B; b++)
        sealtpu_keygen_c0(a + b * stride, s, e + b * stride,
                          out + b * stride, L, n, moduli, r0s, r1s);
}

// out[b] = a[b] * s mod q with a SHARED second operand s [L, n] (secret or
// public key row).
void sealtpu_dyadic_mul_shared_many(const uint64_t *a, const uint64_t *s,
                                    uint64_t *out, size_t B, size_t L,
                                    size_t n, const uint64_t *moduli,
                                    const uint64_t *r0s, const uint64_t *r1s)
{
    const size_t stride = L * n;
    for (size_t b = 0; b < B; b++)
        sealtpu_dyadic_mul(a + b * stride, s, out + b * stride, L, n,
                           moduli, r0s, r1s);
}

void sealtpu_add_inplace_many(uint64_t *a, const uint64_t *b_arr, size_t B,
                              size_t L, size_t n, const uint64_t *moduli)
{
    const size_t stride = L * n;
    for (size_t b = 0; b < B; b++)
        sealtpu_add_inplace(a + b * stride, b_arr + b * stride, L, n,
                            moduli);
}

void sealtpu_add_neg_inplace_many(uint64_t *a, const uint64_t *b_arr,
                                  size_t B, size_t L, size_t n,
                                  const uint64_t *moduli)
{
    const size_t stride = L * n;
    for (size_t b = 0; b < B; b++)
        sealtpu_add_neg_inplace(a + b * stride, b_arr + b * stride, L, n,
                                moduli);
}

// c0[b] += Delta*m[b] + fix for B ciphertexts in one pass: the BFV plain
// embed (sealtpu_scaled_plain) FUSED with the add into each ciphertext's
// c0 rows. cts points at [B, size, L, n] stacked ciphertext data
// (ct_stride = size*L*n u64s between consecutive c0's); m is [B, n]
// zero-padded. Equivalent to scaled_plain + add_inplace per ciphertext.
void sealtpu_scaled_plain_add_many(const uint64_t *m, size_t B, size_t L,
                                   size_t n, const uint64_t *moduli,
                                   const uint64_t *delta, uint64_t q_mod_t,
                                   uint64_t half_t, uint64_t t,
                                   uint64_t *cts, size_t ct_stride)
{
    for (size_t b = 0; b < B; b++) {
        const uint64_t *mb = m + b * n;
        uint64_t *c0 = cts + b * ct_stride;
        for (size_t i = 0; i < n; i++) {
            const uint64_t mi = mb[i];
            if (!mi) continue;
            const uint64_t fix = (uint64_t)(
                ((unsigned __int128)q_mod_t * mi + half_t) / t);
            for (size_t j = 0; j < L; j++) {
                const uint64_t q = moduli[j];
                const uint64_t sv = (uint64_t)(
                    (((unsigned __int128)delta[j] * mi) + fix) % q);
                uint64_t r = c0[j * n + i] + sv;
                if (r >= q) r -= q;
                c0[j * n + i] = r;
            }
        }
    }
}

// B BatchEncoder encodes in one call: v is [B, count] residues mod t
// (already validated), out is [B, n] coefficient-form plaintext data.
void sealtpu_batch_encode_many(const uint64_t *v, size_t B, size_t count,
                               size_t n, const int64_t *index_map,
                               size_t log_n, const uint64_t *inv_op,
                               const uint64_t *inv_qt,
                               const uint64_t *inv_n_op,
                               const uint64_t *inv_n_qt,
                               const uint64_t *last_op,
                               const uint64_t *last_qt,
                               const uint64_t *t_mod, uint64_t *out)
{
    for (size_t b = 0; b < B; b++) {
        uint64_t *ob = out + b * n;
        std::memset(ob, 0, n * sizeof(uint64_t));
        const uint64_t *vb = v + b * count;
        for (size_t i = 0; i < count; i++) ob[index_map[i]] = vb[i];
    }
    // batch-lane INTT mod t across the whole batch (q32 kernel for the
    // typical <= 29-bit plain modulus)
    sealtpu_ntt_inverse_many(out, B, 1, log_n, inv_op, inv_qt, inv_n_op,
                             inv_n_qt, last_op, last_qt, t_mod, 0);
}

// B BatchEncoder decodes: data is [B, n] zero-padded coefficient arrays,
// out is [B, n] slot values.
void sealtpu_batch_decode_many(const uint64_t *data, size_t B, size_t n,
                               const int64_t *index_map, size_t log_n,
                               const uint64_t *fwd_op, const uint64_t *fwd_qt,
                               const uint64_t *t_mod, uint64_t *scratch,
                               uint64_t *out)
{
    std::memcpy(out, data, B * n * sizeof(uint64_t));
    sealtpu_ntt_forward_many(out, B, 1, log_n, fwd_op, fwd_qt, t_mod, 0);
    for (size_t b = 0; b < B; b++) {
        uint64_t *ob = out + b * n;
        std::memcpy(scratch, ob, n * sizeof(uint64_t));
        for (size_t i = 0; i < n; i++) ob[i] = scratch[index_map[i]];
    }
}

// B whole size-2 BFV decrypts through one plan handle: cts is the stacked
// [B, 2, L, n] ciphertext data, out is [B, n] plaintext coefficients.
// The phase runs through the batch-lane NTT kernels (phase2_many), the
// {t, gamma} tail per ciphertext.
void sealtpu_phase2_many(const uint64_t *cts, const uint64_t *sk_ntt,
                         size_t B, size_t L, size_t n, size_t log_n,
                         const uint64_t *fwd_op, const uint64_t *fwd_qt,
                         const uint64_t *inv_op, const uint64_t *inv_qt,
                         const uint64_t *inv_n_op, const uint64_t *inv_n_qt,
                         const uint64_t *last_op, const uint64_t *last_qt,
                         const uint64_t *moduli, const uint64_t *r0s,
                         const uint64_t *r1s, int ntt_form, uint64_t *out);

void sealtpu_bfv_decrypt_plan_many(void *plan, const uint64_t *cts,
                                   size_t B, const uint64_t *sk_ntt,
                                   uint64_t *out)
{
    const BfvDecryptPlan *p = static_cast<BfvDecryptPlan *>(plan);
    const size_t poly = p->L * p->n;
    uint64_t *phases = new uint64_t[B * poly];
    sealtpu_phase2_many(cts, sk_ntt, B, p->L, p->n, p->log_n, p->fwd_op,
                        p->fwd_qt, p->inv_op, p->inv_qt, p->inv_n_op,
                        p->inv_n_qt, p->last_op, p->last_qt, p->moduli,
                        p->r0s, p->r1s, 0, phases);
    for (size_t b = 0; b < B; b++)
        sealtpu_bfv_decrypt_tail(phases + b * poly, p->L, p->n, p->s_op,
                                 p->s_qt, p->moduli, p->M, p->tg, p->tg_r0,
                                 p->tg_r1, p->neg_op, p->neg_qt, p->t,
                                 p->gamma, p->inv_g_op, p->inv_g_qt,
                                 p->tail_scratch, out + b * p->n);
    delete[] phases;
}

// B fused size-2 decrypt phases (CKKS/BGV decrypt front): cts [B, 2, L, n],
// out [B, L, n].
void sealtpu_phase2_many(const uint64_t *cts, const uint64_t *sk_ntt,
                         size_t B, size_t L, size_t n, size_t log_n,
                         const uint64_t *fwd_op, const uint64_t *fwd_qt,
                         const uint64_t *inv_op, const uint64_t *inv_qt,
                         const uint64_t *inv_n_op, const uint64_t *inv_n_qt,
                         const uint64_t *last_op, const uint64_t *last_qt,
                         const uint64_t *moduli, const uint64_t *r0s,
                         const uint64_t *r1s, int ntt_form, uint64_t *out)
{
    const size_t poly = L * n;
    for (size_t b = 0; b < B; b++)
        std::memcpy(out + b * poly, cts + b * 2 * poly + poly,
                    poly * sizeof(uint64_t));
    if (!ntt_form)
        // non-lazy (vs the scalar path's lazy=1): the canonical values
        // feed barrett128 below, whose full reduction of the exact
        // product makes the dyadic output identical either way — this
        // frees the q32 batch-lane kernel for small moduli
        sealtpu_ntt_forward_many(out, B, L, log_n, fwd_op, fwd_qt, moduli,
                                 0);
    for (size_t b = 0; b < B; b++) {
        uint64_t *ob = out + b * poly;
        for (size_t l = 0; l < L; l++) {
            const uint64_t q = moduli[l], r0 = r0s[l], r1 = r1s[l];
            const uint64_t *sl = sk_ntt + l * n;
            uint64_t *ol = ob + l * n;
            for (size_t i = 0; i < n; i++) {
                const unsigned __int128 p =
                    (unsigned __int128)ol[i] * sl[i];
                ol[i] = barrett128((uint64_t)p, (uint64_t)(p >> 64), q,
                                   r0, r1);
            }
        }
    }
    if (!ntt_form)
        sealtpu_ntt_inverse_many(out, B, L, log_n, inv_op, inv_qt,
                                 inv_n_op, inv_n_qt, last_op, last_qt,
                                 moduli, 0);
    for (size_t b = 0; b < B; b++) {
        const uint64_t *c0b = cts + b * 2 * poly;
        uint64_t *ob = out + b * poly;
        for (size_t l = 0; l < L; l++) {
            const uint64_t q = moduli[l];
            const uint64_t *cl = c0b + l * n;
            uint64_t *ol = ob + l * n;
            for (size_t i = 0; i < n; i++) {
                uint64_t r = ol[i] + cl[i];
                if (r >= q) r -= q;
                ol[i] = r;
            }
        }
    }
}

// B CKKS encoder butterfly passes over [B, n] doubles — groups of 8 ride
// the batch-lane DWT kernel (transpose in, butterflies with every vector
// full, transpose out); remainder rows take the scalar kernel.
void sealtpu_dwt_from_rev_many(double *re, double *im, size_t B,
                               size_t log_n, const double *r_re,
                               const double *r_im, int use_scalar,
                               double scalar)
{
    const size_t n = (size_t)1 << log_n;
    size_t b = 0;
#ifdef SEALTPU_AVX512_NTT
    if (log_n >= 3) {
        uint64_t *scratch = lanes_scratch(n * 16);
        double *rc = (double *)scratch;
        double *ic = (double *)(scratch + n * 8);
        for (; b + 8 <= B; b += 8) {
            uint64_t *rrows[8], *irows[8];
            for (int k = 0; k < 8; k++) {
                rrows[k] = (uint64_t *)(re + (b + k) * n);
                irows[k] = (uint64_t *)(im + (b + k) * n);
            }
            lanes8_pack(rrows, n, (uint64_t *)rc);
            lanes8_pack(irows, n, (uint64_t *)ic);
            dwt_from_rev_lanes8(rc, ic, log_n, r_re, r_im, use_scalar,
                                scalar);
            lanes8_unpack((uint64_t *)rc, n, rrows);
            lanes8_unpack((uint64_t *)ic, n, irows);
        }
    }
#endif
    for (; b < B; b++)
        sealtpu_dwt_from_rev(re + b * n, im + b * n, log_n, r_re, r_im,
                             use_scalar, scalar);
}

void sealtpu_dwt_to_rev_many(double *re, double *im, size_t B, size_t log_n,
                             const double *r_re, const double *r_im,
                             int use_scalar, double scalar)
{
    const size_t n = (size_t)1 << log_n;
    size_t b = 0;
#ifdef SEALTPU_AVX512_NTT
    if (log_n >= 3) {
        uint64_t *scratch = lanes_scratch(n * 16);
        double *rc = (double *)scratch;
        double *ic = (double *)(scratch + n * 8);
        for (; b + 8 <= B; b += 8) {
            uint64_t *rrows[8], *irows[8];
            for (int k = 0; k < 8; k++) {
                rrows[k] = (uint64_t *)(re + (b + k) * n);
                irows[k] = (uint64_t *)(im + (b + k) * n);
            }
            lanes8_pack(rrows, n, (uint64_t *)rc);
            lanes8_pack(irows, n, (uint64_t *)ic);
            dwt_to_rev_lanes8(rc, ic, log_n, r_re, r_im, use_scalar,
                              scalar);
            lanes8_unpack((uint64_t *)rc, n, rrows);
            lanes8_unpack((uint64_t *)ic, n, irows);
        }
    }
#endif
    for (; b < B; b++)
        sealtpu_dwt_to_rev(re + b * n, im + b * n, log_n, r_re, r_im,
                           use_scalar, scalar);
}

// B signed-coefficient RNS decomposes: v [B, n] int64, out [B, L, n].
void sealtpu_reduce_signed_rows_many(const int64_t *v, size_t B, size_t n,
                                     size_t L, const uint64_t *q,
                                     const uint64_t *r1s, uint64_t *out)
{
    for (size_t b = 0; b < B; b++)
        sealtpu_reduce_signed_rows(v + b * n, n, L, q, r1s,
                                   out + b * L * n);
}


// CKKS encoder batch helpers: the numpy fancy-index scatter and the
// round/cast/reduce passes cost more than the FFT at small n (r5 profile);
// one crossing each for the whole batch.

// re/im [B, n] <- scatter of B complex slot vectors through the encoder
// index map with the conjugate upper half (ckks.h:493-502 layout).
void sealtpu_ckks_scatter_many(const double *vre, const double *vim,
                               size_t B, size_t k, size_t slots, size_t n,
                               const int64_t *index_map, double *re,
                               double *im)
{
    for (size_t b = 0; b < B; b++) {
        double *rb = re + b * n, *ib = im + b * n;
        std::memset(rb, 0, n * sizeof(double));
        std::memset(ib, 0, n * sizeof(double));
        const double *vr = vre + b * k, *vi = vim + b * k;
        for (size_t i = 0; i < k; i++) {
            const int64_t p0 = index_map[i];
            const int64_t p1 = index_map[slots + i];
            rb[p0] = vr[i];
            ib[p0] = vi[i];
            rb[p1] = vr[i];
            ib[p1] = -vi[i];
        }
    }
}

// Per ct: max |re|, std::round (half away from zero), int64 cast, signed
// Barrett reduce into [L, n] RNS rows. Cts whose max magnitude reaches
// 2^62 are SKIPPED (out_max tells Python, which falls back to the exact
// big-int path / raises) — the double->int64 cast would be UB there.
void sealtpu_ckks_round_reduce_many(const double *re, size_t B, size_t n,
                                    size_t L, const uint64_t *q,
                                    const uint64_t *r1s, uint64_t *out,
                                    double *out_max)
{
    for (size_t b = 0; b < B; b++) {
        const double *rb = re + b * n;
        double mx = 0.0;
        for (size_t i = 0; i < n; i++) {
            const double a = rb[i] < 0 ? -rb[i] : rb[i];
            if (a > mx) mx = a;
        }
        out_max[b] = mx;
        if (mx >= 4611686018427387904.0)  /* 2^62 */
            continue;
        uint64_t *ob = out + b * L * n;
        size_t i0 = 0;
#ifdef SEALTPU_AVX512_NTT
        {
            const __m512d half = _mm512_set1_pd(0.5);
            const __m512d one = _mm512_set1_pd(1.0);
            const __m512i zero = _mm512_setzero_si512();
            for (; i0 + 8 <= n; i0 += 8) {
                const __m512d x = _mm512_loadu_pd(rb + i0);
                const __m512d ax = _mm512_abs_pd(x);
                // std::round semantics: floor(|x|) + (frac >= 0.5)
                const __m512d fl = _mm512_roundscale_pd(
                    ax, _MM_FROUND_TO_NEG_INF | _MM_FROUND_NO_EXC);
                const __mmask8 up = _mm512_cmp_pd_mask(
                    _mm512_sub_pd(ax, fl), half, _CMP_GE_OQ);
                const __m512d r = _mm512_mask_add_pd(fl, up, fl, one);
                const __m512i a = _mm512_cvttpd_epi64(r);  // exact: integral
                const __mmask8 neg = _mm512_cmp_pd_mask(
                    x, _mm512_setzero_pd(), _CMP_LT_OQ);
                for (size_t l = 0; l < L; l++) {
                    const __m512i qv = _mm512_set1_epi64((long long)q[l]);
                    const __m512i r1v = _mm512_set1_epi64(
                        (long long)r1s[l]);
                    // barrett64 per lane
                    const __m512i tmp = mulhi64_v(a, r1v);
                    __m512i rr = _mm512_sub_epi64(
                        a, _mm512_mullo_epi64(tmp, qv));
                    rr = _mm512_min_epu64(rr, _mm512_sub_epi64(rr, qv));
                    // negatives: q - rr where rr != 0
                    const __mmask8 nz = _mm512_cmpneq_epi64_mask(rr, zero);
                    rr = _mm512_mask_sub_epi64(rr, neg & nz, qv, rr);
                    _mm512_storeu_si512(ob + l * n + i0, rr);
                }
            }
        }
#endif
        for (size_t i = i0; i < n; i++) {
            const double x = rb[i];
            const double ax = x < 0 ? -x : x;
            const double fl = __builtin_floor(ax);
            double r = fl + (ax - fl >= 0.5 ? 1.0 : 0.0);
            const int64_t v = (int64_t)(x < 0 ? -r : r);
            const uint64_t a = (uint64_t)(v < 0 ? -v : v);
            for (size_t l = 0; l < L; l++) {
                uint64_t rr = barrett64(a, q[l], r1s[l]);
                if (v < 0 && rr) rr = q[l] - rr;
                ob[l * n + i] = rr;
            }
        }
    }
}


// B BGV decrypt tails in one crossing: per ct, scale the phase rows by
// qhat^{-1} (Shoup), exact-convert to the single base {t} with the
// CT-RSA v-correction (rns.cpp:465-539), exactly the Python
// NativeDecryptTool.bgv_modt pipeline. phases [B, Li, n] are consumed as
// scratch; out [B, n].
void sealtpu_bgv_modt_many(uint64_t *phases, size_t B, size_t Li, size_t n,
                           const uint64_t *s_op, const uint64_t *s_qt,
                           const uint64_t *q, const uint64_t *M_t,
                           uint64_t t, const uint64_t *t_r0,
                           const uint64_t *t_r1, const uint64_t *ratio_lo,
                           const uint64_t *ratio_hi, uint64_t q_mod_t,
                           uint64_t *out)
{
    for (size_t b = 0; b < B; b++) {
        uint64_t *xhat = phases + b * Li * n;
        sealtpu_mul_scalar_shoup(xhat, Li, n, s_op, s_qt, q);
        sealtpu_base_convert_dot(xhat, Li, n, M_t, 1, &t, t_r0, t_r1,
                                 out + b * n);
        sealtpu_exact_convert_fix(xhat, Li, n, ratio_lo, ratio_hi,
                                  out + b * n, q_mod_t, t, 0, 0);
    }
}


// Batched rescale (divide-and-round by the tower's last prime): the
// Python-side numpy u64 '%' passes cost ~25 ns/element — more than the
// transforms at small n. Exact value parity with NativePolyOps
// rescale_coeff/rescale_ntt (ops/rns.py divide_and_round_q_last[_ntt],
// rns.cpp:789-901): same adds, same Barrett residues, same Shoup multiply.

// coefficient domain: x [B, L, n] -> out [B, L-1, n]
void sealtpu_rescale_coeff_many(const uint64_t *x, size_t B, size_t L,
                                size_t n, const uint64_t *q,
                                const uint64_t *r1s,
                                const uint64_t *half_mod,
                                const uint64_t *inv_op,
                                const uint64_t *inv_qt, uint64_t *out)
{
    const uint64_t q_last = q[L - 1];
    const uint64_t half = q_last >> 1;
    for (size_t b = 0; b < B; b++) {
        const uint64_t *xb = x + b * L * n;
        const uint64_t *lastr = xb + (L - 1) * n;
        uint64_t *ob = out + b * (L - 1) * n;
        for (size_t l = 0; l + 1 < L; l++) {
            const uint64_t ql = q[l], r1 = r1s[l];
            const uint64_t off = ql - half_mod[l];
            const uint64_t w = inv_op[l], wq = inv_qt[l];
            const uint64_t *xl = xb + l * n;
            uint64_t *ol = ob + l * n;
            for (size_t i = 0; i < n; i++) {
                uint64_t lastv = lastr[i] + half;
                if (lastv >= q_last) lastv -= q_last;
                uint64_t tmp = barrett64(lastv, ql, r1) + off;
                if (tmp >= ql) tmp -= ql;
                uint64_t d = xl[i] + ql - tmp;
                if (d >= ql) d -= ql;
                ol[i] = mul_shoup(d, w, wq, ql);
            }
        }
    }
}

// NTT domain: x [B, L, n] NTT rows -> out [B, L-1, n] NTT rows. Matches
// NativePolyOps.rescale_ntt_many: INTT the last row, center, lift mod each
// keep prime with the +q-half_mod offset (NO extra reduction — values stay
// < 2q), lazy forward NTT (< 4q), then diff = x + 4q - temp and the full
// Shoup reduce.
void sealtpu_rescale_ntt_many(const uint64_t *x, size_t B, size_t L,
                              size_t log_n, const uint64_t *inv_w_op,
                              const uint64_t *inv_w_qt,
                              const uint64_t *inv_n_op,
                              const uint64_t *inv_n_qt,
                              const uint64_t *last_op,
                              const uint64_t *last_qt,
                              const uint64_t *fwd_op, const uint64_t *fwd_qt,
                              const uint64_t *q, const uint64_t *r1s,
                              const uint64_t *half_mod,
                              const uint64_t *inv_op, const uint64_t *inv_qt,
                              uint64_t *scratch_last /* [B, n] */,
                              uint64_t *out)
{
    const size_t n = (size_t)1 << log_n;
    const uint64_t q_last = q[L - 1];
    const uint64_t half = q_last >> 1;
    // 1. last rows, coefficient domain
    for (size_t b = 0; b < B; b++)
        std::memcpy(scratch_last + b * n, x + b * L * n + (L - 1) * n,
                    n * sizeof(uint64_t));
    sealtpu_ntt_inverse_many(scratch_last, B, 1, log_n,
                             inv_w_op + (L - 1) * n, inv_w_qt + (L - 1) * n,
                             inv_n_op + (L - 1), inv_n_qt + (L - 1),
                             last_op + (L - 1), last_qt + (L - 1),
                             q + (L - 1), 0);
    // 2. center and lift into every keep row of out (becomes `temp`)
    for (size_t b = 0; b < B; b++) {
        const uint64_t *lastr = scratch_last + b * n;
        uint64_t *ob = out + b * (L - 1) * n;
        for (size_t l = 0; l + 1 < L; l++) {
            const uint64_t ql = q[l], r1 = r1s[l];
            const uint64_t off = ql - half_mod[l];
            uint64_t *ol = ob + l * n;
            for (size_t i = 0; i < n; i++) {
                uint64_t lastv = lastr[i] + half;
                if (lastv >= q_last) lastv -= q_last;
                ol[i] = barrett64(lastv, ql, r1) + off;   // < 2q
            }
        }
    }
    // 3. lazy forward NTT of temp (< 4q out)
    sealtpu_ntt_forward_many(out, B, L - 1, log_n, fwd_op, fwd_qt, q, 1);
    // 4. diff = x + 4q - temp, then the exact Shoup reduce
    for (size_t b = 0; b < B; b++) {
        const uint64_t *xb = x + b * L * n;
        uint64_t *ob = out + b * (L - 1) * n;
        for (size_t l = 0; l + 1 < L; l++) {
            const uint64_t ql = q[l];
            const uint64_t w = inv_op[l], wq = inv_qt[l];
            const uint64_t *xl = xb + l * n;
            uint64_t *ol = ob + l * n;
            for (size_t i = 0; i < n; i++)
                ol[i] = mul_shoup(xl[i] + 4 * ql - ol[i], w, wq, ql);
        }
    }
}


// Batched BGV modswitch (exact division by q_last after adding a multiple
// of t; rns.cpp:1203-1240 / ops/rns.py mod_t_and_divide_q_last parity):
// x [B, L, n] coeff-form -> out [B, L-1, n]. All steps canonical, so the
// values equal the JAX limb path's bit-for-bit.
// Per-level constant arrays (length L-1): qlm_op/qlm_qt = Shoup pairs of
// (q_last mod q_l); iql_op/iql_qt = Shoup pairs of q_last^{-1} mod q_l.
void sealtpu_bgv_modtq_many(const uint64_t *x, size_t B, size_t L, size_t n,
                            const uint64_t *q, const uint64_t *r1s,
                            uint64_t t, uint64_t t_r1, uint64_t iqt_op,
                            uint64_t iqt_qt, const uint64_t *qlm_op,
                            const uint64_t *qlm_qt, const uint64_t *iql_op,
                            const uint64_t *iql_qt, uint64_t *out)
{
    for (size_t b = 0; b < B; b++) {
        const uint64_t *xb = x + b * L * n;
        const uint64_t *lastr = xb + (L - 1) * n;
        uint64_t *ob = out + b * (L - 1) * n;
        for (size_t i = 0; i < n; i++) {
            const uint64_t cl = lastr[i];
            uint64_t v = barrett64(cl, t, t_r1);
            v = v ? t - v : 0;                       // -(cl mod t) mod t
            const uint64_t neg_c = mul_shoup(v, iqt_op, iqt_qt, t);
            for (size_t l = 0; l + 1 < L; l++) {
                const uint64_t ql = q[l], r1 = r1s[l];
                uint64_t delta = barrett64(neg_c, ql, r1);
                delta = mul_shoup(delta, qlm_op[l], qlm_qt[l], ql);
                const uint64_t clm = barrett64(cl, ql, r1);
                const uint64_t acc = xb[l * n + i] + 2 * ql - clm - delta;
                ob[l * n + i] = mul_shoup(acc, iql_op[l], iql_qt[l], ql);
            }
        }
    }
}

}  // extern "C"
