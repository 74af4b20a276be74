// Golden-vector dumper: runs the *reference* SEAL build (out-of-tree, see
// tools/oracle/README.md) and emits JSON test vectors consumed by
// tests/test_randomgen.py and tests/test_context.py. This file links against
// the reference library but is original code; no reference sources are
// copied into this repository.
#include <cstdio>
#include <cstdint>
#include "seal/randomgen.h"
#include "seal/encryptionparams.h"
#include "seal/modulus.h"

using namespace seal;

static void dump_bytes(const char *name, const seal_byte *data, size_t n)
{
    printf("  \"%s\": \"", name);
    for (size_t i = 0; i < n; i++)
        printf("%02x", static_cast<unsigned>(static_cast<unsigned char>(data[i])));
    printf("\"");
}

static void dump_parms_id(const char *name, const EncryptionParameters &parms)
{
    auto &id = parms.parms_id();
    printf("  \"%s\": [%llu, %llu, %llu, %llu]", name,
        (unsigned long long)id[0], (unsigned long long)id[1],
        (unsigned long long)id[2], (unsigned long long)id[3]);
}

int main()
{
    printf("{\n");

    prng_seed_type seed{ 1, 2, 3, 4, 5, 6, 7, 8 };
    {
        Blake2xbPRNGFactory factory(seed);
        auto prng = factory.create();
        seal_byte buf[8192];
        prng->generate(sizeof(buf), buf);
        dump_bytes("blake2xb_12345678_first8192", buf, 160);
        printf(",\n");
        dump_bytes("blake2xb_12345678_at4090", buf + 4090, 16);
        printf(",\n");
    }
    {
        prng_seed_type zseed{ 0, 0, 0, 0, 0, 0, 0, 0 };
        Blake2xbPRNGFactory factory(zseed);
        auto prng = factory.create();
        seal_byte buf[64];
        prng->generate(sizeof(buf), buf);
        dump_bytes("blake2xb_zero_first64", buf, 64);
        printf(",\n");
    }
    {
        Shake256PRNGFactory factory(seed);
        auto prng = factory.create();
        seal_byte buf[64];
        prng->generate(sizeof(buf), buf);
        dump_bytes("shake256_12345678_first64", buf, 64);
        printf(",\n");
    }
    {
        EncryptionParameters parms(scheme_type::bfv);
        parms.set_poly_modulus_degree(4096);
        parms.set_coeff_modulus(CoeffModulus::BFVDefault(4096));
        parms.set_plain_modulus(PlainModulus::Batching(4096, 20));
        dump_parms_id("parms_id_bfv_4096_default", parms);
        printf(",\n");
    }
    {
        EncryptionParameters parms(scheme_type::bfv);
        parms.set_poly_modulus_degree(64);
        parms.set_coeff_modulus(CoeffModulus::Create(64, { 40, 40, 40 }));
        parms.set_plain_modulus(257);
        dump_parms_id("parms_id_bfv_64_tiny", parms);
        printf(",\n");
    }
    {
        EncryptionParameters parms(scheme_type::ckks);
        parms.set_poly_modulus_degree(8192);
        parms.set_coeff_modulus(CoeffModulus::Create(8192, { 60, 40, 40, 60 }));
        dump_parms_id("parms_id_ckks_8192", parms);
        printf("\n");
    }
    printf("}\n");
    return 0;
}
