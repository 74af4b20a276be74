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
    for (size_t i = 0; i < n; i++) {
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
    const size_t stride = L << log_n;
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
    const size_t stride = L << log_n;
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
    for (size_t b = 0; b < B; b++)
        sealtpu_batch_encode(v + b * count, count, n, index_map, log_n,
                             inv_op, inv_qt, inv_n_op, inv_n_qt, last_op,
                             last_qt, t_mod, out + b * n);
}

// B BatchEncoder decodes: data is [B, n] zero-padded coefficient arrays,
// out is [B, n] slot values.
void sealtpu_batch_decode_many(const uint64_t *data, size_t B, size_t n,
                               const int64_t *index_map, size_t log_n,
                               const uint64_t *fwd_op, const uint64_t *fwd_qt,
                               const uint64_t *t_mod, uint64_t *scratch,
                               uint64_t *out)
{
    for (size_t b = 0; b < B; b++)
        sealtpu_batch_decode(data + b * n, n, n, index_map, log_n, fwd_op,
                             fwd_qt, t_mod, scratch, out + b * n);
}

// B whole size-2 BFV decrypts through one plan handle: cts is the stacked
// [B, 2, L, n] ciphertext data, out is [B, n] plaintext coefficients.
void sealtpu_bfv_decrypt_plan_many(void *plan, const uint64_t *cts,
                                   size_t B, const uint64_t *sk_ntt,
                                   uint64_t *out)
{
    const BfvDecryptPlan *p = static_cast<BfvDecryptPlan *>(plan);
    const size_t poly = p->L * p->n;
    for (size_t b = 0; b < B; b++)
        sealtpu_bfv_decrypt_plan(plan, cts + b * 2 * poly,
                                 cts + b * 2 * poly + poly, sk_ntt,
                                 out + b * p->n);
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
        sealtpu_phase2(cts + b * 2 * poly, cts + b * 2 * poly + poly,
                       sk_ntt, L, n, log_n, fwd_op, fwd_qt, inv_op, inv_qt,
                       inv_n_op, inv_n_qt, last_op, last_qt, moduli, r0s,
                       r1s, ntt_form, out + b * poly);
}

// B CKKS encoder butterfly passes over [B, n] doubles.
void sealtpu_dwt_from_rev_many(double *re, double *im, size_t B,
                               size_t log_n, const double *r_re,
                               const double *r_im, int use_scalar,
                               double scalar)
{
    const size_t n = (size_t)1 << log_n;
    for (size_t b = 0; b < B; b++)
        sealtpu_dwt_from_rev(re + b * n, im + b * n, log_n, r_re, r_im,
                             use_scalar, scalar);
}

void sealtpu_dwt_to_rev_many(double *re, double *im, size_t B, size_t log_n,
                             const double *r_re, const double *r_im,
                             int use_scalar, double scalar)
{
    const size_t n = (size_t)1 << log_n;
    for (size_t b = 0; b < B; b++)
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

}  // extern "C"
