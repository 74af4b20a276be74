// x86 comparator benchmark for BASELINE.md: times the reference library's
// headline ops (CKKS n=16384 L=8 multiply+relinearize+rescale, and the
// negacyclic NTT) the same way native/bench/bench.cpp does (µs/op), but
// with std::chrono instead of Google Benchmark (no network for deps).
// Mirrors native/bench/bench.cpp:30-152 op set for the headline rows.
#include <chrono>
#include <cstdio>
#include <vector>
#include "seal/seal.h"
#include "seal/util/ntt.h"
#include "seal/util/polyarithsmallmod.h"

using namespace seal;
using namespace std;
using Clock = chrono::steady_clock;

template <typename F>
static double time_us(F &&f, int reps)
{
    f(); // warm
    auto t0 = Clock::now();
    for (int i = 0; i < reps; i++)
        f();
    auto t1 = Clock::now();
    return chrono::duration<double, micro>(t1 - t0).count() / reps;
}

int main()
{
    size_t n = 16384;
    // 8 data primes + special = log q 438, same grid row as bench.cpp n=16384
    EncryptionParameters parms(scheme_type::ckks);
    parms.set_poly_modulus_degree(n);
    parms.set_coeff_modulus(CoeffModulus::Create(n, { 48, 48, 48, 48, 48, 48, 48, 48, 54 }));
    SEALContext ctx(parms);

    KeyGenerator keygen(ctx);
    SecretKey sk = keygen.secret_key();
    PublicKey pk;
    keygen.create_public_key(pk);
    RelinKeys rk;
    keygen.create_relin_keys(rk);

    Encryptor enc(ctx, pk);
    Evaluator ev(ctx);
    CKKSEncoder encoder(ctx);

    double scale = pow(2.0, 40);
    vector<double> vals(encoder.slot_count());
    for (size_t i = 0; i < vals.size(); i++)
        vals[i] = -1.0 + 2.0 * double(i) / double(vals.size() - 1);
    Plaintext p1, p2;
    encoder.encode(vals, scale, p1);
    encoder.encode(vals, scale, p2);
    Ciphertext c1, c2;
    enc.encrypt(p1, c1);
    enc.encrypt(p2, c2);

    int reps = 20;
    double mul_us = time_us([&] {
        Ciphertext out;
        ev.multiply(c1, c2, out);
    }, reps);
    double pipeline_us = time_us([&] {
        Ciphertext out;
        ev.multiply(c1, c2, out);
        ev.relinearize_inplace(out, rk);
        ev.rescale_to_next_inplace(out);
    }, reps);

    // UTIL NTT row (bench.cpp:141-152 analogue): forward NTT of one n-coeff
    // poly mod the first prime.
    auto &cd = *ctx.first_context_data();
    auto ntt_tables = cd.small_ntt_tables();
    vector<uint64_t> poly(n);
    for (size_t i = 0; i < n; i++)
        poly[i] = i % cd.parms().coeff_modulus()[0].value();
    double ntt_us = time_us([&] {
        util::ntt_negacyclic_harvey(poly.data(), ntt_tables[0]);
    }, 200);

    printf("{\n");
    printf("  \"ckks_n16384_L8_mult_us\": %.1f,\n", mul_us);
    printf("  \"ckks_n16384_L8_mult_relin_rescale_us\": %.1f,\n", pipeline_us);
    printf("  \"ckks_n16384_L8_mult_relin_rescale_ops_per_s\": %.3f,\n", 1e6 / pipeline_us);
    printf("  \"ntt_n16384_fwd_us\": %.2f,\n", ntt_us);
    printf("  \"ntt_n16384_fwd_per_s\": %.1f\n", 1e6 / ntt_us);
    printf("}\n");
    return 0;
}
