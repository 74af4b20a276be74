// Production-scale (n=4096) wire-format dump: serialized BYTES of a
// ciphertext, seeded symmetric ciphertext, seeded relin/galois keys, and
// (when the linked build supports them) zlib/zstd-framed ciphertexts.
// Byte-compared (not hash-compared) by tests/test_serialization.py —
// pins size fields, seed markers and compression framing at production
// scale (serialization.h:58-120, serializable.h:53).
//
// PRNG consumption order: KeyGenerator ctor -> relin (seeded) ->
// galois {3} (seeded) -> public key -> encrypt p1 -> encrypt_symmetric p1
// (seeded).
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
    parms.set_poly_modulus_degree(4096);
    parms.set_coeff_modulus(CoeffModulus::Create(4096, { 36, 36, 37 }));
    parms.set_plain_modulus(PlainModulus::Batching(4096, 20));
    prng_seed_type seed{ 1, 2, 3, 4, 5, 6, 7, 8 };
    parms.set_random_generator(make_shared<Blake2xbPRNGFactory>(seed));
    SEALContext context(parms, true, sec_level_type::tc128);

    printf("{\n");
    {
        stringstream ss;
        parms.save(ss, compr_mode_type::none);
        dump_hex("parms", ss.str());
    }
    KeyGenerator keygen(context);
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
    PublicKey pk;
    keygen.create_public_key(pk);
    Encryptor enc(context, pk);
    enc.set_secret_key(keygen.secret_key());

    BatchEncoder encoder(context);
    vector<uint64_t> vals(encoder.slot_count());
    for (size_t i = 0; i < vals.size(); i++)
        vals[i] = (17 * i + 3) % 1000;
    Plaintext p1;
    encoder.encode(vals, p1);
    Ciphertext ct;
    enc.encrypt(p1, ct);
    {
        stringstream ss;
        ct.save(ss, compr_mode_type::none);
        dump_hex("ct_none", ss.str());
    }
#ifdef SEAL_USE_ZLIB
    {
        stringstream ss;
        ct.save(ss, compr_mode_type::zlib);
        dump_hex("ct_zlib", ss.str());
    }
#endif
#ifdef SEAL_USE_ZSTD
    {
        stringstream ss;
        ct.save(ss, compr_mode_type::zstd);
        dump_hex("ct_zstd", ss.str());
    }
#endif
    {
        stringstream ss;
        auto serializable = enc.encrypt_symmetric(p1);
        serializable.save(ss, compr_mode_type::none);
        dump_hex("ct_sym_seeded", ss.str());
    }
    printf("  \"end\": \"\"\n}\n");
    return 0;
}
