// Dumps seeded CKKS pipeline vectors from the reference library.
// Consumed by tests/test_ckks_bitexact.py.
//
// CKKS *encoding* is double-precision FFT (rounding order may legitimately
// differ between implementations), so the encoded plaintext coefficients are
// dumped and used as the test INPUT; everything after encode (encrypt,
// multiply, relinearize, rescale, rotate, conjugate, mod-switch, decrypt) is
// exact integer math and must match bit-for-bit under the fixed PRNG seed.
#include <cstdio>
#include <cstdint>
#include <cmath>
#include <vector>
#include <complex>
#include "seal/seal.h"

using namespace seal;
using namespace std;

static void dump_u64s(const char *name, const uint64_t *data, size_t n, bool last = false)
{
    printf("  \"%s\": [", name);
    for (size_t i = 0; i < n; i++)
        printf("%llu%s", (unsigned long long)data[i], i + 1 == n ? "" : ",");
    printf("]%s\n", last ? "" : ",");
}

static void dump_ct(const char *name, const Ciphertext &ct, bool last = false)
{
    char buf[128];
    for (size_t j = 0; j < ct.size(); j++)
    {
        snprintf(buf, sizeof(buf), "%s_c%zu", name, j);
        dump_u64s(buf, ct.data(j), ct.poly_modulus_degree() * ct.coeff_modulus_size(),
                  last && j + 1 == ct.size());
    }
}

static void dump_doubles(const char *name, const vector<double> &v, bool last = false)
{
    printf("  \"%s\": [", name);
    for (size_t i = 0; i < v.size(); i++)
        printf("%.17g%s", v[i], i + 1 == v.size() ? "" : ",");
    printf("]%s\n", last ? "" : ",");
}

int main()
{
    prng_seed_type seed{ 1, 2, 3, 4, 5, 6, 7, 8 };
    size_t n = 64;
    printf("{\n");

    EncryptionParameters parms(scheme_type::ckks);
    parms.set_poly_modulus_degree(n);
    parms.set_coeff_modulus(CoeffModulus::Create(n, { 40, 40, 40, 40 }));
    parms.set_random_generator(make_shared<Blake2xbPRNGFactory>(seed));
    SEALContext context(parms, true, sec_level_type::none);
    double scale = pow(2.0, 30);
    printf("  \"n\": %zu,\n", n);
    printf("  \"coeff_modulus_bits\": [40,40,40,40],\n");
    printf("  \"scale_log2\": 30,\n");

    KeyGenerator keygen(context);
    auto &sk = keygen.secret_key();
    dump_u64s("secret_key", sk.data().data(), n * 4);
    PublicKey pk;
    keygen.create_public_key(pk);
    dump_ct("public_key", pk.data());
    RelinKeys rk;
    keygen.create_relin_keys(rk);
    // relin key for s^2: all decomp entries (L_decomp=3 at key level 4)
    for (size_t i = 0; i < rk.data()[0].size(); i++)
    {
        char buf[64];
        snprintf(buf, sizeof(buf), "relin_key_%zu", i);
        dump_ct(buf, rk.data()[0][i].data());
    }
    GaloisKeys gk;
    keygen.create_galois_keys(vector<uint32_t>{ 3, (uint32_t)(2 * n - 1) }, gk);

    CKKSEncoder encoder(context);
    size_t slots = encoder.slot_count();
    vector<double> v1(slots), v2(slots);
    for (size_t i = 0; i < slots; i++)
    {
        v1[i] = 0.001 * (double)i - 0.5;
        v2[i] = 1.0 / (double)(i + 1);
    }
    dump_doubles("values1", v1);
    dump_doubles("values2", v2);
    Plaintext p1, p2;
    encoder.encode(v1, scale, p1);
    encoder.encode(v2, scale, p2);
    // first (data) level has 3 primes — the 4th is the key-switching prime
    dump_u64s("plain1", p1.data(), n * 3);
    dump_u64s("plain2", p2.data(), n * 3);

    Encryptor enc(context, pk);
    enc.set_secret_key(sk);
    Decryptor dec(context, sk);
    Evaluator ev(context);

    Ciphertext c1, c2;
    enc.encrypt(p1, c1);
    dump_ct("ct1", c1);
    enc.encrypt(p2, c2);
    dump_ct("ct2", c2);

    // symmetric encryption (consumes a separate PRNG instance seeded the same)
    Ciphertext csym;
    enc.encrypt_symmetric(p1, csym);
    dump_ct("ct1_sym", csym);

    Ciphertext cm;
    ev.multiply(c1, c2, cm);
    dump_ct("mul", cm);
    Ciphertext cr;
    ev.relinearize(cm, rk, cr);
    dump_ct("relin", cr);
    Ciphertext cs;
    ev.rescale_to_next(cr, cs);
    dump_ct("rescale", cs);
    printf("  \"rescale_scale\": %.17g,\n", cs.scale());

    Ciphertext csq;
    ev.square(c1, csq);
    ev.relinearize_inplace(csq, rk);
    ev.rescale_to_next_inplace(csq);
    dump_ct("square_relin_rescale", csq);

    Ciphertext crot;
    ev.rotate_vector(c1, 1, gk, crot);
    dump_ct("rot1", crot);
    Ciphertext cconj;
    ev.complex_conjugate(c1, gk, cconj);
    dump_ct("conj", cconj);

    Ciphertext cms;
    ev.mod_switch_to_next(c1, cms);
    dump_ct("modswitch", cms);

    Ciphertext cadd;
    ev.add(c1, c2, cadd);
    dump_ct("add", cadd);
    Ciphertext cneg;
    ev.negate(c1, cneg);
    dump_ct("negate", cneg);

    // plaintext ops at matched level/scale
    Ciphertext cap;
    ev.add_plain(c1, p2, cap);
    dump_ct("add_plain", cap);
    Ciphertext cmp;
    ev.multiply_plain(c1, p2, cmp);
    dump_ct("mul_plain", cmp);

    // second-level encryption: encrypt fresh at the next parms in the chain
    auto next_parms_id = context.first_context_data()->next_context_data()->parms_id();
    Plaintext p3;
    encoder.encode(v1, next_parms_id, scale, p3);
    dump_u64s("plain3_level1", p3.data(), n * 2);
    Ciphertext c3;
    enc.encrypt(p3, c3);
    dump_ct("ct3_level1", c3);

    // exact scalar encodes (constant fills — bit-exact across impls)
    Plaintext p_sc, p_int;
    encoder.encode(0.7, scale, p_sc);
    dump_u64s("plain_scalar_0p7", p_sc.data(), n * 3);
    encoder.encode((int64_t)-5, p_int);
    dump_u64s("plain_int_m5", p_int.data(), n * 3);

    // decrypt + decode of the rescaled product, for tolerance checks
    Plaintext pd;
    dec.decrypt(cs, pd);
    dump_u64s("rescale_decrypted", pd.data(), n * 2);
    vector<double> out;
    encoder.decode(pd, out);
    dump_doubles("rescale_decoded", out, true);

    printf("}\n");
    return 0;
}
