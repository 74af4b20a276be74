// Dumps hex-encoded SEAL-wire-format serializations from the reference
// library. Consumed by tests/test_serialization.py for byte-level interop.
#include <cstdio>
#include <sstream>
#include <vector>
#include "seal/seal.h"

using namespace seal;
using namespace std;

static void dump_hex(const char *name, const string &s, bool last = false)
{
    printf("  \"%s\": \"", name);
    for (unsigned char c : s)
        printf("%02x", c);
    printf("\"%s\n", last ? "" : ",");
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
    EncryptionParameters parms(scheme_type::bfv);
    parms.set_poly_modulus_degree(64);
    parms.set_coeff_modulus(CoeffModulus::Create(64, { 40, 40, 40 }));
    parms.set_plain_modulus(257);
    prng_seed_type seed{ 1, 2, 3, 4, 5, 6, 7, 8 };
    parms.set_random_generator(make_shared<Blake2xbPRNGFactory>(seed));
    SEALContext context(parms, true, sec_level_type::none);

    printf("{\n");
    {
        stringstream ss;
        parms.save(ss, compr_mode_type::none);
        dump_hex("parms", ss.str());
    }
    KeyGenerator keygen(context);
    auto &sk = keygen.secret_key();
    dump_hex("secret_key", ser(sk));
    PublicKey pk;
    keygen.create_public_key(pk);
    dump_hex("public_key", ser(pk));
    RelinKeys rk;
    keygen.create_relin_keys(rk);
    dump_hex("relin_keys", ser(rk));

    Encryptor enc(context, pk);
    enc.set_secret_key(sk);
    Plaintext p1("5x^3 + 2x^1 + 3");
    dump_hex("plain1", ser(p1));
    Ciphertext ct;
    enc.encrypt(p1, ct);
    dump_hex("ct1", ser(ct));

    // seeded symmetric ciphertext (Serializable<Ciphertext>)
    {
        stringstream ss;
        auto serializable = enc.encrypt_symmetric(p1);
        serializable.save(ss, compr_mode_type::none);
        dump_hex("ct_sym_seeded", ss.str());
    }
    // zlib-compressed ciphertext (if supported in this build: none-only
    // build falls back to throwing; guard by trying)
    printf("  \"end\": \"\"\n}\n");
    return 0;
}
