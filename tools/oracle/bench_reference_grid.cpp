// Per-op x86 comparator grid for BASELINE.md: times the reference library
// over the same (n, op) grid as tools/bench_ops_tpu.py — the FULL op set of
// native/bench/bench.cpp:30-152 (keygen families, encrypt/decrypt,
// encode/decode, add/sub/negate ct+pt, multiply, square, mul_pt,
// relinearize, rescale/mod_switch, rotations, to/from NTT, raw NTT) with
// std::chrono (Google Benchmark needs a network fetch this sandbox forbids).
//
// Build (after the tools/oracle/README.md reference build):
//   g++ -O3 -march=native -std=c++17 tools/oracle/bench_reference_grid.cpp \
//     -I/root/reference/native/src -I/tmp/seal-build/native/src \
//     /tmp/seal-build/lib/libseal-4.0.a -o /tmp/bench_ref_grid
//
// Modes: ckks (default) | bfv | bgv | keygen | small
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

static void emit(const char *head, size_t n, size_t L, const map<string, double> &us,
                 const char *scheme = nullptr)
{
    if (scheme)
        printf("{\"n\": %zu, \"L\": %zu, \"scheme\": \"%s\", \"us\": {", n, L, scheme);
    else
        printf("{\"n\": %zu, \"L\": %zu, \"us\": {", n, L);
    (void)head;
    bool first = true;
    for (auto &kv : us)
    {
        printf("%s\"%s\": %.1f", first ? "" : ", ", kv.first.c_str(), kv.second);
        first = false;
    }
    printf("}}\n");
    fflush(stdout);
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
    enc.set_secret_key(keygen.secret_key());
    Evaluator ev(ctx);
    Decryptor dec(ctx, keygen.secret_key());
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
    us["encrypt_pk"] = time_us([&] { Ciphertext o; enc.encrypt(p1, o); }, reps);
    us["encrypt_sk"] = time_us([&] { Ciphertext o; enc.encrypt_symmetric(p1, o); }, reps);
    us["decrypt"] = time_us([&] { Plaintext p; dec.decrypt(c1, p); }, reps);
    us["encode"] = time_us([&] { Plaintext p; encoder.encode(vals, scale, p); }, reps);
    us["decode"] = time_us([&] { vector<double> v; encoder.decode(p1, v); }, reps);
    us["add_ct"] = time_us([&] { Ciphertext o; ev.add(c1, c2, o); }, reps);
    us["add_pt"] = time_us([&] { Ciphertext o; ev.add_plain(c1, p1, o); }, reps);
    us["sub_ct"] = time_us([&] { Ciphertext o; ev.sub(c1, c2, o); }, reps);
    us["negate"] = time_us([&] { Ciphertext o; ev.negate(c1, o); }, reps);
    us["multiply"] = time_us([&] { Ciphertext o; ev.multiply(c1, c2, o); }, reps);
    us["square"] = time_us([&] { Ciphertext o; ev.square(c1, o); }, reps);
    us["mul_pt"] = time_us([&] { Ciphertext o; ev.multiply_plain(c1, p1, o); }, reps);
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

    emit("ckks", n, L, us);
}

// n=1024/2048 default-parms rows (one prime: no keyswitching, no rescale —
// exactly what the reference bench can run there, bench.cpp:160-176).
static void bench_small(size_t n, bool bgv = false)
{
    EncryptionParameters parms(bgv ? scheme_type::bgv : scheme_type::bfv);
    parms.set_poly_modulus_degree(n);
    parms.set_coeff_modulus(CoeffModulus::BFVDefault(n));
    parms.set_plain_modulus(786433);  // 20-bit batching prime for n=1024/2048
    SEALContext ctx(parms);

    KeyGenerator keygen(ctx);
    PublicKey pk;
    keygen.create_public_key(pk);
    Encryptor enc(ctx, pk);
    enc.set_secret_key(keygen.secret_key());
    Evaluator ev(ctx);
    Decryptor dec(ctx, keygen.secret_key());
    BatchEncoder encoder(ctx);

    vector<uint64_t> vals(encoder.slot_count());
    for (size_t i = 0; i < 8; i++)
        vals[i] = i + 1;
    Plaintext p1;
    encoder.encode(vals, p1);
    Ciphertext c1, c2;
    enc.encrypt(p1, c1);
    enc.encrypt(p1, c2);

    int reps = 50;
    map<string, double> us;
    us["keygen_secret"] = time_us([&] { KeyGenerator kg(ctx); }, reps);
    us["keygen_public"] = time_us([&] { PublicKey o; keygen.create_public_key(o); }, reps);
    us["encrypt_pk"] = time_us([&] { Ciphertext o; enc.encrypt(p1, o); }, reps);
    us["encrypt_sk"] = time_us([&] { Ciphertext o; enc.encrypt_symmetric(p1, o); }, reps);
    us["decrypt"] = time_us([&] { Plaintext p; dec.decrypt(c1, p); }, reps);
    us["encode"] = time_us([&] { Plaintext p; encoder.encode(vals, p); }, reps);
    us["decode"] = time_us([&] { vector<uint64_t> v; encoder.decode(p1, v); }, reps);
    us["add_ct"] = time_us([&] { Ciphertext o; ev.add(c1, c2, o); }, reps);
    us["negate"] = time_us([&] { Ciphertext o; ev.negate(c1, o); }, reps);
    us[bgv ? "multiply" : "multiply_behz"] =
        time_us([&] { Ciphertext o; ev.multiply(c1, c2, o); }, reps);
    us["square"] = time_us([&] { Ciphertext o; ev.square(c1, o); }, reps);
    us["mul_pt"] = time_us([&] { Ciphertext o; ev.multiply_plain(c1, p1, o); }, reps);
    if (!bgv)
    {
        // BFV-only transforms (BGV ciphertexts are NTT-form already)
        Ciphertext cn = c1;
        us["to_ntt"] = time_us([&] { Ciphertext o; ev.transform_to_ntt(c1, o); }, reps);
        ev.transform_to_ntt_inplace(cn);
        us["from_ntt"] = time_us([&] { Ciphertext o; ev.transform_from_ntt(cn, o); }, reps);
    }

    size_t L = ctx.first_context_data()->parms().coeff_modulus().size();
    emit("small", n, L, us, bgv ? "bgv" : "bfv");
}

static void bench_keygen(size_t n, const vector<int> &bits)
{
    EncryptionParameters parms(scheme_type::ckks);
    parms.set_poly_modulus_degree(n);
    parms.set_coeff_modulus(CoeffModulus::Create(n, bits));
    SEALContext ctx(parms);
    KeyGenerator keygen(ctx);

    int reps = n >= 16384 ? 5 : 10;
    map<string, double> us;
    us["keygen_secret"] = time_us([&] { KeyGenerator kg(ctx); }, reps);
    us["keygen_public"] = time_us([&] { PublicKey o; keygen.create_public_key(o); }, reps);
    us["keygen_relin"] = time_us([&] { RelinKeys o; keygen.create_relin_keys(o); }, reps);
    us["keygen_galois_one"] = time_us(
        [&] {
            GaloisKeys o;
            keygen.create_galois_keys(vector<int>{ 1 }, o);
        },
        reps);
    us["keygen_galois_all"] = time_us(
        [&] {
            GaloisKeys o;
            keygen.create_galois_keys(o);
        },
        n >= 16384 ? 2 : 4);

    emit("keygen", n, bits.size() - 1, us);
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
    enc.set_secret_key(keygen.secret_key());
    Evaluator ev(ctx);
    Decryptor dec(ctx, keygen.secret_key());
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
    us["encrypt_pk"] = time_us([&] { Ciphertext o; enc.encrypt(p1, o); }, reps);
    us["encrypt_sk"] = time_us([&] { Ciphertext o; enc.encrypt_symmetric(p1, o); }, reps);
    us["decrypt"] = time_us([&] { Plaintext p; dec.decrypt(c1, p); }, reps);
    us["encode"] = time_us([&] { Plaintext p; encoder.encode(vals, p); }, reps);
    us["decode"] = time_us([&] { vector<uint64_t> v; encoder.decode(p1, v); }, reps);
    us["add_ct"] = time_us([&] { Ciphertext o; ev.add(c1, c2, o); }, reps);
    us["negate"] = time_us([&] { Ciphertext o; ev.negate(c1, o); }, reps);
    us[bgv ? "multiply" : "multiply_behz"] =
        time_us([&] { Ciphertext o; ev.multiply(c1, c2, o); }, reps);
    us["square"] = time_us([&] { Ciphertext o; ev.square(c1, o); }, reps);
    us["mul_pt"] = time_us([&] { Ciphertext o; ev.multiply_plain(c1, p1, o); }, reps);
    us["relinearize"] = time_us([&] { Ciphertext o = c3; ev.relinearize_inplace(o, rk); }, reps);
    us["mod_switch"] = time_us([&] { Ciphertext o; ev.mod_switch_to_next(c1, o); }, reps);
    if (!bgv)
    {
        Ciphertext cn = c1;
        us["to_ntt"] = time_us([&] { Ciphertext o; ev.transform_to_ntt(c1, o); }, reps);
        ev.transform_to_ntt_inplace(cn);
        us["from_ntt"] = time_us([&] { Ciphertext o; ev.transform_from_ntt(cn, o); }, reps);
    }

    emit("bfv", n, bits.size() - 1, us, bgv ? "bgv" : "bfv");
}


// Single-prime small parms (n in {1024, 2048}, log q in {27, 54}): no
// special prime => no relin/rotate; the keyswitch-free CKKS family
// (bench.cpp covers these sizes for all schemes).
static void bench_ckks_small(size_t n)
{
    EncryptionParameters parms(scheme_type::ckks);
    parms.set_poly_modulus_degree(n);
    parms.set_coeff_modulus(CoeffModulus::BFVDefault(n));
    SEALContext ctx(parms);
    KeyGenerator keygen(ctx);
    PublicKey pk;
    keygen.create_public_key(pk);
    Encryptor enc(ctx, pk);
    enc.set_secret_key(keygen.secret_key());
    Evaluator ev(ctx);
    Decryptor dec(ctx, keygen.secret_key());
    CKKSEncoder encoder(ctx);
    double scale = pow(2.0, n == 1024 ? 10 : 20);
    vector<double> vals(encoder.slot_count());
    for (size_t i = 0; i < vals.size(); i++)
        vals[i] = -1.0 + 2.0 * double(i) / double(vals.size() - 1);
    Plaintext p1;
    encoder.encode(vals, scale, p1);
    Ciphertext c1, c2;
    enc.encrypt(p1, c1);
    enc.encrypt(p1, c2);
    int reps = 50;
    map<string, double> us;
    us["encrypt_pk"] = time_us([&] { Ciphertext o; enc.encrypt(p1, o); }, reps);
    us["encrypt_sk"] = time_us([&] { Ciphertext o; enc.encrypt_symmetric(p1, o); }, reps);
    us["decrypt"] = time_us([&] { Plaintext p; dec.decrypt(c1, p); }, reps);
    us["encode"] = time_us([&] { Plaintext p; encoder.encode(vals, scale, p); }, reps);
    us["decode"] = time_us([&] { vector<double> v; encoder.decode(p1, v); }, reps);
    us["add_ct"] = time_us([&] { Ciphertext o; ev.add(c1, c2, o); }, reps);
    us["multiply"] = time_us([&] { Ciphertext o; ev.multiply(c1, c2, o); }, reps);
    us["square"] = time_us([&] { Ciphertext o; ev.square(c1, o); }, reps);
    us["mul_pt"] = time_us([&] { Ciphertext o; ev.multiply_plain(c1, p1, o); }, reps);
    us["negate"] = time_us([&] { Ciphertext o; ev.negate(c1, o); }, reps);
    printf("{\"n\": %zu, \"L\": 1, \"scheme\": \"ckks\", \"mode\": \"small\", \"us\": {", n);
    bool first = true;
    for (auto &kv : us) {
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
    if (mode == "keygen")
    {
        bench_keygen(4096, { 36, 36, 37 });
        bench_keygen(16384, { 48, 48, 48, 48, 48, 48, 48, 48, 54 });
        return 0;
    }
    if (mode == "small")
    {
        bench_small(1024);
        bench_small(2048);
        return 0;
    }
    if (mode == "ckks_small")
    {
        bench_ckks_small(1024);
        bench_ckks_small(2048);
        return 0;
    }
    if (mode == "bgv_small")
    {
        bench_small(1024, true);
        bench_small(2048, true);
        return 0;
    }
    bench_one(4096, { 36, 36, 37 });
    bench_one(8192, { 43, 43, 43, 43, 46 });
    bench_one(16384, { 48, 48, 48, 48, 48, 48, 48, 48, 54 });
    bench_one(32768, { 55, 55, 55, 55, 55, 55, 55, 55, 55, 55, 55, 55, 55, 55, 55, 56 });
    return 0;
}
