// Dumps seeded BGV pipeline vectors and BFV Galois-key/rotation vectors
// from the reference library. Consumed by tests/test_bgv_bitexact.py and
// tests/test_rotation_bitexact.py.
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
    prng_seed_type seed{ 1, 2, 3, 4, 5, 6, 7, 8 };
    printf("{\n");

    {
        EncryptionParameters parms(scheme_type::bgv);
        parms.set_poly_modulus_degree(64);
        parms.set_coeff_modulus(CoeffModulus::Create(64, { 40, 40, 40 }));
        parms.set_plain_modulus(257);
        parms.set_random_generator(make_shared<Blake2xbPRNGFactory>(seed));
        SEALContext context(parms, true, sec_level_type::none);
        KeyGenerator keygen(context);
        auto &sk = keygen.secret_key();
        dump_u64s("bgv_secret_key", sk.data().data(), 64 * 3);
        PublicKey pk;
        keygen.create_public_key(pk);
        dump_ct("bgv_public_key", pk.data());
        RelinKeys rk;
        keygen.create_relin_keys(rk);
        Encryptor enc(context, pk);
        Decryptor dec(context, sk);
        Evaluator ev(context);
        Plaintext p1("5x^3 + 2x^1 + 3"), p2("1x^2 + 4");
        Ciphertext c1, c2;
        enc.encrypt(p1, c1);
        dump_ct("bgv_ct1", c1);
        enc.encrypt(p2, c2);
        Ciphertext cm, cr, cs;
        ev.multiply(c1, c2, cm);
        dump_ct("bgv_mul", cm);
        printf("  \"bgv_mul_correction\": %llu,\n", (unsigned long long)cm.correction_factor());
        ev.relinearize(cm, rk, cr);
        dump_ct("bgv_relin", cr);
        ev.mod_switch_to_next(cr, cs);
        dump_ct("bgv_modswitch", cs);
        printf("  \"bgv_modswitch_correction\": %llu,\n", (unsigned long long)cs.correction_factor());
        Plaintext out;
        dec.decrypt(cs, out);
        printf("  \"bgv_modswitch_decrypted\": \"%s\",\n", out.to_string().c_str());
        Ciphertext ca;
        ev.add(c1, c2, ca);
        dump_ct("bgv_add", ca);

        // deeper chain: multiply AGAIN at level 1, relinearize, switch to
        // the last level — exercises BGV correction-factor tracking across
        // levels (evaluator.cpp:710-794, mod_t_and_divide_q_last)
        Ciphertext cs2, cm2;
        ev.mod_switch_to_next(c2, cs2);
        ev.multiply(cs, cs2, cm2);
        dump_ct("bgv_mul_level1", cm2);
        printf("  \"bgv_mul_level1_correction\": %llu,\n",
               (unsigned long long)cm2.correction_factor());
        ev.relinearize_inplace(cm2, rk);
        dump_ct("bgv_chain_bottom", cm2);
        printf("  \"bgv_chain_bottom_correction\": %llu,\n",
               (unsigned long long)cm2.correction_factor());
        Plaintext out2;
        dec.decrypt(cm2, out2);
        printf("  \"bgv_chain_bottom_decrypted\": \"%s\",\n", out2.to_string().c_str());
    }

    {
        EncryptionParameters parms(scheme_type::bfv);
        parms.set_poly_modulus_degree(64);
        parms.set_coeff_modulus(CoeffModulus::Create(64, { 40, 40, 40 }));
        parms.set_plain_modulus(257);
        parms.set_random_generator(make_shared<Blake2xbPRNGFactory>(seed));
        SEALContext context(parms, true, sec_level_type::none);
        KeyGenerator keygen(context);
        auto &sk = keygen.secret_key();
        PublicKey pk;
        keygen.create_public_key(pk);
        GaloisKeys gk;
        keygen.create_galois_keys(vector<uint32_t>{ 3, 9, 27, 127 }, gk);
        // galois key for element 3: dump both decomp entries
        for (size_t i = 0; i < gk.data()[GaloisKeys::get_index(3)].size(); i++)
        {
            char buf[64];
            snprintf(buf, sizeof(buf), "galois3_%zu", i);
            dump_ct(buf, gk.data()[GaloisKeys::get_index(3)][i].data());
        }
        Encryptor enc(context, pk);
        Evaluator ev(context);
        BatchEncoder be(context);
        vector<uint64_t> vals(64);
        for (size_t i = 0; i < 64; i++) vals[i] = i;
        Plaintext p;
        be.encode(vals, p);
        Ciphertext ct;
        enc.encrypt(p, ct);
        Ciphertext rot;
        ev.rotate_rows(ct, 3, gk, rot);
        dump_ct("bfv_rot3", rot);
        Ciphertext galois;
        ev.apply_galois(ct, 9, gk, galois);
        dump_ct("bfv_galois9", galois, true);
    }
    printf("}\n");
    return 0;
}
