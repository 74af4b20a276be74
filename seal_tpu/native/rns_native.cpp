// Native host engine for CRT composition — the host-side hot loop of CKKS
// decoding (and RNSBase::compose_array parity, reference util/rns.cpp:321-399).
// The device path never composes; this runs once per decode on the host,
// where a Python big-int loop over n=16384 coefficients is the bottleneck.
//
// Algorithm (reference rns.cpp:359-399): per coefficient,
//   y_i = x_i * [q̂_i^{-1}]_{q_i} mod q_i            (small)
//   v   = Σ y_i * q̂_i                               (multiword, < L·Q)
//   v  %= Q                                          (≤ L conditional subs)
// then center around Q/2 and convert to double * inv_scale (CKKS decode) or
// emit the full word vector (compose_array).

#include <cstddef>
#include <cstdint>
#include <cstring>

using u64 = uint64_t;
using u128 = unsigned __int128;

static inline u64 mulmod(u64 a, u64 b, u64 q)
{
    return (u64)(((u128)a * b) % q);
}

// Shoup multiply by a FIXED operand b with precomputed bq = floor(b*2^64/q):
// canonical result, identical value to mulmod (hot loops precompute bq once
// per prime — the hardware 128/64 division in mulmod was ~60% of the whole
// CKKS decode tail).
static inline u64 mulmod_shoup(u64 a, u64 b, u64 bq, u64 q)
{
    u64 r = b * a - (u64)(((u128)a * bq) >> 64) * q;
    return r >= q ? r - q : r;
}

// acc[W+1] += y * row[W]
static inline void mul_add_scalar(u64 *acc, const u64 *row, u64 y, size_t W)
{
    u64 carry = 0;
    for (size_t w = 0; w < W; w++)
    {
        u128 p = (u128)row[w] * y + acc[w] + carry;
        acc[w] = (u64)p;
        carry = (u64)(p >> 64);
    }
    acc[W] += carry;
}

static inline int cmp_words(const u64 *a, const u64 *b, size_t W)
{
    for (size_t w = W; w-- > 0;)
    {
        if (a[w] != b[w])
            return a[w] < b[w] ? -1 : 1;
    }
    return 0;
}

static inline void sub_words(u64 *a, const u64 *b, size_t W)
{
    u64 borrow = 0;
    for (size_t w = 0; w < W; w++)
    {
        u64 t = a[w] - b[w];
        u64 borrow2 = t > a[w];
        u64 t2 = t - borrow;
        borrow = borrow2 | (t2 > t);
        a[w] = t2;
    }
}

static inline double words_to_double(const u64 *a, size_t W)
{
    double r = 0.0;
    for (size_t w = W; w-- > 0;)
        r = r * 18446744073709551616.0 + (double)a[w];
    return r;
}

extern "C" {

// rows: [L][n] residues row-major; y_mul[i] = [q̂_i^{-1}]_{q_i};
// qhat: [L][W] little-endian punctured products; Q, half: [W].
// out[j] = centered(CRT(rows[:, j])) * inv_scale as double.
void sealtpu_crt_compose_center_f64(
    const u64 *rows, size_t L, size_t n,
    const u64 *y_mul, const u64 *moduli,
    const u64 *qhat, const u64 *Q, const u64 *half, size_t W,
    double inv_scale, double *out)
{
    // WMAX: L ≤ 64 primes of ≤ 61 bits each -> Q < 2^3904 -> 61 words + 1
    constexpr size_t WMAX = 66;
    u64 acc[WMAX + 1];
    u64 tmp[WMAX + 1];
    u64 Qext[WMAX + 1];
    u64 halfext[WMAX + 1];
    if (W > WMAX)
        return;
    std::memset(Qext, 0, sizeof(Qext));
    std::memcpy(Qext, Q, W * sizeof(u64));
    std::memset(halfext, 0, sizeof(halfext));
    std::memcpy(halfext, half, W * sizeof(u64));

    for (size_t j = 0; j < n; j++)
    {
        std::memset(acc, 0, (W + 1) * sizeof(u64));
        for (size_t i = 0; i < L; i++)
        {
            u64 y = mulmod(rows[i * n + j], y_mul[i], moduli[i]);
            mul_add_scalar(acc, qhat + i * W, y, W);
        }
        // reduce: acc < L*Q, so at most L subtractions
        while (cmp_words(acc, Qext, W + 1) >= 0)
            sub_words(acc, Qext, W + 1);
        double v;
        if (cmp_words(acc, halfext, W + 1) >= 0)
        {
            // centered negative: -(Q - acc)
            std::memcpy(tmp, Qext, (W + 1) * sizeof(u64));
            sub_words(tmp, acc, W + 1);
            v = -words_to_double(tmp, W + 1);
        }
        else
        {
            v = words_to_double(acc, W + 1);
        }
        out[j] = v * inv_scale;
    }
}

// Reference-exact CKKS decode reconstruction (ckks.h:694-731): compose,
// then per-64-bit-word signed double accumulation in the reference's exact
// operation order — res +/-= (double)diff * (inv_scale * 2^64j), word by
// word — so the resulting doubles are bit-identical to the reference.
void sealtpu_crt_decode_center_ref(
    const u64 *rows, size_t L, size_t n,
    const u64 *y_mul, const u64 *moduli,
    const u64 *qhat, const u64 *Q, const u64 *half, size_t W,
    double inv_scale, double *out)
{
    constexpr size_t WMAX = 66;
    constexpr double two_pow_64 = 18446744073709551616.0;
    u64 acc[WMAX + 1];
    u64 Qext[WMAX + 1];
    u64 halfext[WMAX + 1];
    u64 ymq[64];
    if (W > WMAX || L > 64)
        return;
    for (size_t i = 0; i < L; i++)
        ymq[i] = (u64)(((u128)y_mul[i] << 64) / moduli[i]);
    if (W == 1 && L == 1)
    {
        // trivial base (single-prime CKKS): y_mul = qhat = 1, so decode is
        // pure centering — no modular multiply at all
        const u64 Q0 = Q[0], h0 = half[0];
        for (size_t j = 0; j < n; j++)
        {
            const u64 v = rows[j] >= Q0 ? rows[j] - Q0 : rows[j];
            if (v >= h0)
            {
                const u64 d = Q0 - v;
                out[j] = d ? -((double)d * inv_scale) : 0.0;
            }
            else
            {
                out[j] = v ? (double)v * inv_scale : 0.0;
            }
        }
        return;
    }
    if (W == 1)
    {
        // single-word base (every small-parms CKKS decode): no multiword
        // buffers, straight u128 accumulation
        const u64 Q0 = Q[0], h0 = half[0];
        for (size_t j = 0; j < n; j++)
        {
            u128 acc1 = 0;
            for (size_t i = 0; i < L; i++)
                acc1 += (u128)qhat[i] * mulmod_shoup(
                    rows[i * n + j], y_mul[i], ymq[i], moduli[i]);
            while (acc1 >= Q0)
                acc1 -= Q0;
            const u64 a0 = (u64)acc1;
            double res;
            if (a0 >= h0)
            {
                u64 d = Q0 - a0;
                res = d ? -((double)d * inv_scale) : 0.0;
            }
            else
            {
                res = a0 ? (double)a0 * inv_scale : 0.0;
            }
            out[j] = res;
        }
        return;
    }
    std::memset(Qext, 0, sizeof(Qext));
    std::memcpy(Qext, Q, W * sizeof(u64));
    std::memset(halfext, 0, sizeof(halfext));
    std::memcpy(halfext, half, W * sizeof(u64));

    for (size_t j = 0; j < n; j++)
    {
        std::memset(acc, 0, (W + 1) * sizeof(u64));
        for (size_t i = 0; i < L; i++)
        {
            u64 y = mulmod_shoup(rows[i * n + j], y_mul[i], ymq[i],
                                 moduli[i]);
            mul_add_scalar(acc, qhat + i * W, y, W);
        }
        while (cmp_words(acc, Qext, W + 1) >= 0)
            sub_words(acc, Qext, W + 1);
        double res = 0.0;
        double s = inv_scale;
        if (cmp_words(acc, halfext, W + 1) >= 0)
        {
            for (size_t w = 0; w < W; w++, s *= two_pow_64)
            {
                if (acc[w] > Qext[w])
                {
                    u64 d = acc[w] - Qext[w];
                    res += d ? (double)d * s : 0.0;
                }
                else
                {
                    u64 d = Qext[w] - acc[w];
                    res -= d ? (double)d * s : 0.0;
                }
            }
        }
        else
        {
            for (size_t w = 0; w < W; w++, s *= two_pow_64)
            {
                u64 d = acc[w];
                res += d ? (double)d * s : 0.0;
            }
        }
        out[j] = res;
    }
}

// Full compose: out[j*W .. j*W+W) = CRT(rows[:, j]) as W little-endian words
// (RNSBase::compose_array parity, rns.cpp:359-399).
void sealtpu_crt_compose_words(
    const u64 *rows, size_t L, size_t n,
    const u64 *y_mul, const u64 *moduli,
    const u64 *qhat, const u64 *Q, size_t W,
    u64 *out)
{
    constexpr size_t WMAX = 66;
    u64 acc[WMAX + 1];
    u64 Qext[WMAX + 1];
    if (W > WMAX)
        return;
    std::memset(Qext, 0, sizeof(Qext));
    std::memcpy(Qext, Q, W * sizeof(u64));

    for (size_t j = 0; j < n; j++)
    {
        std::memset(acc, 0, (W + 1) * sizeof(u64));
        for (size_t i = 0; i < L; i++)
        {
            u64 y = mulmod(rows[i * n + j], y_mul[i], moduli[i]);
            mul_add_scalar(acc, qhat + i * W, y, W);
        }
        while (cmp_words(acc, Qext, W + 1) >= 0)
            sub_words(acc, Qext, W + 1);
        std::memcpy(out + j * W, acc, W * sizeof(u64));
    }
}


// B reference-exact CKKS decode reconstructions: rows [B, L, n] -> out
// [B, n] doubles, one crossing for the whole batch (bit-identical to B
// sequential sealtpu_crt_decode_center_ref calls).
void sealtpu_crt_decode_center_ref_many(
    const u64 *rows, size_t B, size_t L, size_t n,
    const u64 *y_mul, const u64 *moduli,
    const u64 *qhat, const u64 *Q, const u64 *half, size_t W,
    double inv_scale, double *out)
{
    for (size_t b = 0; b < B; b++)
        sealtpu_crt_decode_center_ref(rows + b * L * n, L, n, y_mul, moduli,
                                      qhat, Q, half, W, inv_scale,
                                      out + b * n);
}

} // extern "C"

