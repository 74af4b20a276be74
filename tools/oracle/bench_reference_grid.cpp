// Per-op x86 comparator grid for BASELINE.md: times the reference library
// over the same (n, op) grid as tools/bench_ops_tpu.py — multiply,
// relinearize, rescale, rotate (single and a naive 8-rotation batch; the
// reference has no hoisting), forward NTT over the L-tower, and encode.
// Mirrors the op set of native/bench/bench.cpp:30-152 with std::chrono
// (Google Benchmark needs a network fetch this sandbox forbids).
//
// Build (after the tools/oracle/README.md reference build):
//   g++ -O3 -march=native -std=c++17 tools/oracle/bench_reference_grid.cpp \
//     -I/root/reference/native/src -I/tmp/seal-build/native/src \
//     /tmp/seal-build/lib/libseal-4.0.a -o /tmp/bench_ref_grid
#include <chrono>
#include <cstdio>
#include <map>
#include <string>
#include <vector>
#include "seal/seal.h"
#include "seal/util/ntt.h"

using namespace seal;
using namespace std;
using Clock = chrono::steady_clock;

template <typename F>
static double time_us(F &&f, int reps)
{
    f();
    auto t0 = Clock::now();
    for (int i = 0; i < reps; i++)
        f();
    auto t1 = Clock::now();
    return chrono::duration<double, micro>(t1 - t0).count() / reps;
}

static void bench_one(size_t n, const vector<int> &bits)
{
    EncryptionParameters parms(scheme_type::ckks);
    parms.set_poly_modulus_degree(n);
    parms.set_coeff_modulus(CoeffModulus::Create(n, bits));
    SEALContext ctx(parms);

    KeyGenerator keygen(ctx);
    PublicKey pk;
    keygen.create_public_key(pk);
    RelinKeys rk;
    keygen.create_relin_keys(rk);
    GaloisKeys gk;
    vector<int> steps;
    for (int i = 0; i < 8; i++)
        steps.push_back(1 << i);
    keygen.create_galois_keys(steps, gk);

    Encryptor enc(ctx, pk);
    Evaluator ev(ctx);
    CKKSEncoder encoder(ctx);

    double scale = pow(2.0, n > 4096 ? 40 : 30);
    vector<double> vals(encoder.slot_count());
    for (size_t i = 0; i < vals.size(); i++)
        vals[i] = -1.0 + 2.0 * double(i) / double(vals.size() - 1);
    Plaintext p1;
    encoder.encode(vals, scale, p1);
    Ciphertext c1, c2;
    enc.encrypt(p1, c1);
    enc.encrypt(p1, c2);
    Ciphertext c3;
    ev.multiply(c1, c2, c3);

    int reps = n >= 16384 ? 10 : 25;
    map<string, double> us;
    us["multiply"] = time_us([&] { Ciphertext o; ev.multiply(c1, c2, o); }, reps);
    us["relinearize"] = time_us([&] { Ciphertext o = c3; ev.relinearize_inplace(o, rk); }, reps);
    Ciphertext c3r = c3;
    ev.relinearize_inplace(c3r, rk);
    us["rescale"] = time_us([&] { Ciphertext o; ev.rescale_to_next(c3r, o); }, reps);
    us["rotate_one"] = time_us([&] { Ciphertext o; ev.rotate_vector(c1, 1, gk, o); }, reps);
    us["rotate_8"] = time_us(
        [&] {
            for (int s : steps)
            {
                Ciphertext o;
                ev.rotate_vector(c1, s, gk, o);
            }
        },
        reps);
    auto tables = ctx.key_context_data()->small_ntt_tables();
    size_t L = bits.size() - 1;
    vector<uint64_t> poly(n * L, 3);
    us["ntt_forward_L"] = time_us(
        [&] {
            for (size_t j = 0; j < L; j++)
                util::ntt_negacyclic_harvey(poly.data() + j * n, tables[j]);
        },
        reps);
    us["encode"] = time_us([&] { Plaintext p; encoder.encode(vals, scale, p); }, reps);

    printf("{\"n\": %zu, \"L\": %zu, \"us\": {", n, L);
    bool first = true;
    for (auto &kv : us)
    {
        printf("%s\"%s\": %.1f", first ? "" : ", ", kv.first.c_str(), kv.second);
        first = false;
    }
    printf("}}\n");
    fflush(stdout);
}

static void bench_bfv(size_t n, const vector<int> &bits, bool bgv = false)
{
    EncryptionParameters parms(bgv ? scheme_type::bgv : scheme_type::bfv);
    parms.set_poly_modulus_degree(n);
    parms.set_coeff_modulus(CoeffModulus::Create(n, bits));
    parms.set_plain_modulus(PlainModulus::Batching(n, 20));
    SEALContext ctx(parms);

    KeyGenerator keygen(ctx);
    PublicKey pk;
    keygen.create_public_key(pk);
    RelinKeys rk;
    keygen.create_relin_keys(rk);

    Encryptor enc(ctx, pk);
    Evaluator ev(ctx);
    BatchEncoder encoder(ctx);

    vector<uint64_t> vals(encoder.slot_count());
    for (size_t i = 0; i < 8; i++)
        vals[i] = i + 1;
    Plaintext p1;
    encoder.encode(vals, p1);
    Ciphertext c1, c2, c3;
    enc.encrypt(p1, c1);
    enc.encrypt(p1, c2);
    ev.multiply(c1, c2, c3);

    int reps = n >= 16384 ? 10 : 25;
    map<string, double> us;
    us[bgv ? "multiply" : "multiply_behz"] =
        time_us([&] { Ciphertext o; ev.multiply(c1, c2, o); }, reps);
    us["relinearize"] = time_us([&] { Ciphertext o = c3; ev.relinearize_inplace(o, rk); }, reps);
    us["mod_switch"] = time_us([&] { Ciphertext o; ev.mod_switch_to_next(c1, o); }, reps);

    printf("{\"n\": %zu, \"L\": %zu, \"scheme\": \"%s\", \"us\": {",
           n, bits.size() - 1, bgv ? "bgv" : "bfv");
    bool first = true;
    for (auto &kv : us)
    {
        printf("%s\"%s\": %.1f", first ? "" : ", ", kv.first.c_str(), kv.second);
        first = false;
    }
    printf("}}\n");
    fflush(stdout);
}

int main(int argc, char **argv)
{
    string mode = argc > 1 ? argv[1] : "ckks";
    if (mode == "bfv" || mode == "bgv")
    {
        bool bgv = mode == "bgv";
        bench_bfv(4096, { 36, 36, 37 }, bgv);
        bench_bfv(16384, { 48, 48, 48, 48, 48, 48, 48, 48, 54 }, bgv);
        return 0;
    }
    bench_one(4096, { 36, 36, 37 });
    bench_one(8192, { 43, 43, 43, 43, 46 });
    bench_one(16384, { 48, 48, 48, 48, 48, 48, 48, 48, 54 });
    bench_one(32768, { 55, 55, 55, 55, 55, 55, 55, 55, 55, 55, 55, 55, 55, 55, 55, 56 });
    return 0;
}
