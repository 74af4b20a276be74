// CKKS + BGV wire-format serializations from the reference (the base
// dumper covers BFV). Consumed by tests/test_serialization.py for
// byte-level interop of NTT-form plaintexts and CKKS/BGV ciphertexts.
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

template <typename T>
static string ser(const T &obj)
{
    stringstream ss;
    obj.save(ss, compr_mode_type::none);
    return ss.str();
}

int main()
{
    printf("{\n");
    {
        EncryptionParameters parms(scheme_type::ckks);
        parms.set_poly_modulus_degree(64);
        parms.set_coeff_modulus(CoeffModulus::Create(64, { 40, 40, 40, 40 }));
        prng_seed_type seed{ 1, 2, 3, 4, 5, 6, 7, 8 };
        parms.set_random_generator(make_shared<Blake2xbPRNGFactory>(seed));
        SEALContext ctx(parms, true, sec_level_type::none);
        KeyGenerator keygen(ctx);
        PublicKey pk;
        keygen.create_public_key(pk);
        Encryptor enc(ctx, pk);
        enc.set_secret_key(keygen.secret_key());
        CKKSEncoder encoder(ctx);
        vector<double> vals(encoder.slot_count());
        for (size_t i = 0; i < vals.size(); i++)
            vals[i] = 0.1 * double(i) - 1.0;
        Plaintext p;
        encoder.encode(vals, pow(2.0, 30), p);
        dump_hex("ckks_plain", ser(p));
        Ciphertext ct;
        enc.encrypt(p, ct);
        dump_hex("ckks_ct", ser(ct));
        stringstream ss;
        enc.encrypt_symmetric(p).save(ss, compr_mode_type::none);
        dump_hex("ckks_ct_sym_seeded", ss.str());
    }
    {
        EncryptionParameters parms(scheme_type::bgv);
        parms.set_poly_modulus_degree(64);
        parms.set_coeff_modulus(CoeffModulus::Create(64, { 40, 40, 40 }));
        parms.set_plain_modulus(257);
        prng_seed_type seed{ 1, 2, 3, 4, 5, 6, 7, 8 };
        parms.set_random_generator(make_shared<Blake2xbPRNGFactory>(seed));
        SEALContext ctx(parms, true, sec_level_type::none);
        KeyGenerator keygen(ctx);
        PublicKey pk;
        keygen.create_public_key(pk);
        Encryptor enc(ctx, pk);
        Plaintext p("3x^5 + 1x^1 + 2");
        Ciphertext ct;
        enc.encrypt(p, ct);
        dump_hex("bgv_ct", ser(ct));
    }
    printf("  \"end\": \"\"\n}\n");
    return 0;
}
