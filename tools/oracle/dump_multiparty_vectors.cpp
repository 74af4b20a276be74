// Dumps multiparty (threshold) golden vectors from the reference FORK:
// per-party secret keys, shared-c1 public keys, common public/secret keys,
// encryption under the CPK, per-party partial decryptions, and the
// aggregated plaintext. Consumed by tests/test_multiparty_bitexact.py.
//
// Party keys must differ for the vectors to pin anything interesting, but
// the PRNG factory lives in EncryptionParameters and parms_id does not hash
// it — so each party gets its own context (same parms_id, different seed)
// and the objects interoperate freely, exactly as N real hosts would.
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
    size_t n = 64;
    const int parties = 3;   // the fork hard-codes 3 in aggregate (decryptor.cpp:108)

    auto make_parms = [&](uint64_t s0) {
        EncryptionParameters parms(scheme_type::bfv);
        parms.set_poly_modulus_degree(n);
        parms.set_coeff_modulus(CoeffModulus::Create(n, { 40, 40, 40 }));
        parms.set_plain_modulus(257);
        prng_seed_type seed{ s0, 2, 3, 4, 5, 6, 7, 8 };
        parms.set_random_generator(make_shared<Blake2xbPRNGFactory>(seed));
        return parms;
    };

    // one context per party: identical parms_id, distinct PRNG streams
    vector<SEALContext> ctxs;
    for (int i = 0; i < parties; i++)
        ctxs.emplace_back(make_parms(10 + i), true, sec_level_type::none);

    printf("{\n");

    vector<unique_ptr<KeyGenerator>> kgs;
    for (int i = 0; i < parties; i++)
        kgs.push_back(make_unique<KeyGenerator>(ctxs[i]));

    vector<SecretKey> sks(parties);
    for (int i = 0; i < parties; i++)
    {
        kgs[i]->gen_secret_key(sks[i]);
        char buf[32];
        snprintf(buf, sizeof(buf), "sk%d", i);
        dump_u64s(buf, sks[i].data().data(), n * 3);
    }

    // party 0 publishes pk0; the others share its c1
    vector<PublicKey> pks(parties);
    kgs[0]->create_public_key_with_sk(pks[0], sks[0]);
    for (int i = 1; i < parties; i++)
        kgs[i]->create_public_key_with_same_c1(pks[0], pks[i], sks[i]);
    for (int i = 0; i < parties; i++)
    {
        char buf[32];
        snprintf(buf, sizeof(buf), "pk%d", i);
        dump_ct(buf, pks[i].data());
    }

    PublicKey cpk;
    kgs[0]->create_common_public_key(cpk, pks, parties);
    dump_ct("cpk", cpk.data());

    SecretKey csk;
    kgs[0]->create_common_secret_key(csk, sks, parties);
    dump_u64s("csk", csk.data().data(), n * 3);

    // encrypt under the common key (party 0's PRNG stream)
    Encryptor encryptor(ctxs[0], cpk);
    Plaintext p("2Ax^5 + 6");
    Ciphertext ct;
    encryptor.encrypt(p, ct);
    dump_ct("ct", ct);

    // per-party partial decryptions (the fork stores the partial in data(1))
    vector<Ciphertext> partials(parties);
    for (int i = 0; i < parties; i++)
    {
        Decryptor d(ctxs[i], sks[i]);
        d.distributed_decrypt(ct, partials[i]);
        char buf[32];
        snprintf(buf, sizeof(buf), "partial%d", i);
        dump_u64s(buf, partials[i].data(1),
                  ct.poly_modulus_degree() * ct.coeff_modulus_size());
    }

    Decryptor d0(ctxs[0], sks[0]);
    Plaintext out;
    d0.aggregate_partial_decryption(ct, partials, out, parties);
    dump_u64s("aggregated_plain", out.data(), out.coeff_count());

    // cross-check: the common secret key decrypts directly
    Decryptor dcsk(ctxs[0], csk);
    Plaintext out2;
    dcsk.decrypt(ct, out2);
    dump_u64s("csk_plain", out2.data(), out2.coeff_count());

    // --- common Galois keys (fork wrappers hard-code get_elts_all) ---------
    auto galois_tool = ctxs[0].key_context_data()->galois_tool();
    vector<uint32_t> all_elts = galois_tool->get_elts_all();
    uint32_t elt_step1 = galois_tool->get_elt_from_step(1);
    uint32_t elt_conj = (uint32_t)(2 * n - 1);

    vector<GaloisKeys> gks(parties);
    kgs[0]->create_galois_keys_with_sk(gks[0], sks[0]);
    for (int i = 1; i < parties; i++)
        kgs[i]->create_galois_keys_with_sk_c1(gks[i], sks[i], gks[0]);

    auto dump_gk = [&](const char *prefix, const GaloisKeys &gk) {
        for (uint32_t elt : { elt_step1, elt_conj })
        {
            auto &ks = gk.data()[GaloisKeys::get_index(elt)];
            for (size_t j = 0; j < ks.size(); j++)
            {
                char buf[96];
                snprintf(buf, sizeof(buf), "%s_elt%u_k%zu", prefix, elt, j);
                dump_ct(buf, ks[j].data());
            }
        }
    };
    for (int i = 0; i < parties; i++)
    {
        char buf[32];
        snprintf(buf, sizeof(buf), "gk%d", i);
        dump_gk(buf, gks[i]);
    }

    // gen_common_galois_keys aggregates INTO gks[0] and returns it (the
    // public wrapper hard-codes get_elts_all)
    GaloisKeys common;
    kgs[0]->gen_common_galois_keys(gks, parties, common);
    dump_gk("common_gk", common);

    // threshold rotation: rotate under the common keys, then aggregate-decrypt
    Evaluator evaluator(ctxs[0]);
    Ciphertext ct_rot;
    evaluator.rotate_rows(ct, 1, common, ct_rot);
    dump_ct("ct_rot", ct_rot);
    vector<Ciphertext> rot_partials(parties);
    for (int i = 0; i < parties; i++)
    {
        Decryptor d(ctxs[i], sks[i]);
        d.distributed_decrypt(ct_rot, rot_partials[i]);
    }
    Plaintext rot_out;
    d0.aggregate_partial_decryption(ct_rot, rot_partials, rot_out, parties);
    dump_u64s("rot_aggregated_plain", rot_out.data(), rot_out.coeff_count(), true);

    printf("}\n");
    return 0;
}
