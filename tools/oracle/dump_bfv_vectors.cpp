// Dumps seeded-PRNG BFV golden vectors from the reference library:
// keygen, public key, asymmetric+symmetric encryption, evaluator ops,
// decryption, batching. Consumed by tests/test_bfv_bitexact.py.
#include <cstdio>
#include <cstdint>
#include <vector>
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

int main()
{
    EncryptionParameters parms(scheme_type::bfv);
    size_t n = 64;
    parms.set_poly_modulus_degree(n);
    parms.set_coeff_modulus(CoeffModulus::Create(n, { 40, 40, 40 }));
    parms.set_plain_modulus(257);
    prng_seed_type seed{ 1, 2, 3, 4, 5, 6, 7, 8 };
    parms.set_random_generator(make_shared<Blake2xbPRNGFactory>(seed));

    SEALContext context(parms, true, sec_level_type::none);

    printf("{\n");
    KeyGenerator keygen(context);
    auto &sk = keygen.secret_key();
    dump_u64s("secret_key", sk.data().data(), n * 3);

    PublicKey pk;
    keygen.create_public_key(pk);
    dump_ct("public_key", pk.data());

    RelinKeys rk;
    keygen.create_relin_keys(rk);
    // relin key for s^2: decomp prime 0 and 1, each a size-2 ct over 3 primes
    for (size_t i = 0; i < rk.data()[0].size(); i++)
    {
        char buf[64];
        snprintf(buf, sizeof(buf), "relin0_%zu", i);
        dump_ct(buf, rk.data()[0][i].data());
    }

    Encryptor encryptor(context, pk);
    encryptor.set_secret_key(sk);
    Decryptor decryptor(context, sk);

    Plaintext p1("5x^3 + 2x^1 + 3");
    Plaintext p2("1x^63 + 4x^2 + 1");

    Ciphertext ct1, ct2;
    encryptor.encrypt(p1, ct1);
    dump_ct("ct1", ct1);
    encryptor.encrypt(p2, ct2);
    dump_ct("ct2", ct2);

    Ciphertext ct_sym;
    encryptor.encrypt_symmetric(p1, ct_sym);
    dump_ct("ct_sym", ct_sym);

    Evaluator evaluator(context);
    Ciphertext ct_add;
    evaluator.add(ct1, ct2, ct_add);
    dump_ct("ct_add", ct_add);

    Ciphertext ct_neg;
    evaluator.negate(ct1, ct_neg);
    dump_ct("ct_neg", ct_neg);

    Ciphertext ct_mul;
    evaluator.multiply(ct1, ct2, ct_mul);
    dump_ct("ct_mul", ct_mul);

    Ciphertext ct_relin;
    evaluator.relinearize(ct_mul, rk, ct_relin);
    dump_ct("ct_relin", ct_relin);

    Ciphertext ct_modswitch;
    evaluator.mod_switch_to_next(ct_relin, ct_modswitch);
    dump_ct("ct_modswitch", ct_modswitch);

    Plaintext p_mul;
    decryptor.decrypt(ct_mul, p_mul);
    printf("  \"mul_decrypted\": \"%s\",\n", p_mul.to_string().c_str());
    Plaintext p_relin;
    decryptor.decrypt(ct_relin, p_relin);
    printf("  \"relin_decrypted\": \"%s\",\n", p_relin.to_string().c_str());
    Plaintext p_ms;
    decryptor.decrypt(ct_modswitch, p_ms);
    printf("  \"modswitch_decrypted\": \"%s\",\n", p_ms.to_string().c_str());

    printf("  \"noise_budget_ct1\": %d,\n", decryptor.invariant_noise_budget(ct1));
    printf("  \"noise_budget_mul\": %d,\n", decryptor.invariant_noise_budget(ct_mul));

    // plain ops
    Ciphertext ct_addp, ct_mulp;
    evaluator.add_plain(ct1, p2, ct_addp);
    dump_ct("ct_add_plain", ct_addp);
    evaluator.multiply_plain(ct1, p2, ct_mulp);
    dump_ct("ct_mul_plain", ct_mulp);

    // batching (t=257 supports batching for n=64)
    BatchEncoder be(context);
    vector<uint64_t> vals(64);
    for (size_t i = 0; i < 64; i++) vals[i] = (i * 7 + 1) % 257;
    Plaintext p_batch;
    be.encode(vals, p_batch);
    dump_u64s("batch_encoded", p_batch.data(), p_batch.coeff_count(), true);
    printf("}\n");
    return 0;
}
