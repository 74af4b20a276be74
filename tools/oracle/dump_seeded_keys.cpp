// Seed-compressed key serializations (Serializable<RelinKeys/GaloisKeys>,
// keygenerator.h create_relin_keys()/create_galois_keys(elts) save_seed
// overloads). Consumed by tests/test_serialization.py for byte-level
// interop of half-size keys. PRNG consumption order in this program:
// KeyGenerator ctor (sk sample) -> seeded relin keys -> seeded galois {3}.
#include <cstdio>
#include <sstream>
#include <vector>
#include "seal/seal.h"

using namespace seal;
using namespace std;

static void dump_hex(const char *name, const string &s)
{
    printf("  \"%s\": \"", name);
    for (unsigned char c : s)
        printf("%02x", c);
    printf("\",\n");
}

int main()
{
    EncryptionParameters parms(scheme_type::bfv);
    parms.set_poly_modulus_degree(64);
    parms.set_coeff_modulus(CoeffModulus::Create(64, { 40, 40, 40 }));
    parms.set_plain_modulus(257);
    prng_seed_type seed{ 1, 2, 3, 4, 5, 6, 7, 8 };
    parms.set_random_generator(make_shared<Blake2xbPRNGFactory>(seed));
    SEALContext context(parms, true, sec_level_type::none);

    KeyGenerator keygen(context);
    printf("{\n");
    {
        stringstream ss;
        auto rk = keygen.create_relin_keys();
        rk.save(ss, compr_mode_type::none);
        dump_hex("relin_keys_seeded", ss.str());
    }
    {
        stringstream ss;
        auto gk = keygen.create_galois_keys(vector<uint32_t>{ 3 });
        gk.save(ss, compr_mode_type::none);
        dump_hex("galois_keys_seeded", ss.str());
    }
    {
        stringstream ss;
        auto pk = keygen.create_public_key();
        pk.save(ss, compr_mode_type::none);
        dump_hex("public_key_seeded", ss.str());
    }
    printf("  \"end\": \"\"\n}\n");
    return 0;
}
