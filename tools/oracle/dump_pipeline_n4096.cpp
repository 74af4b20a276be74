// Production-size golden pipeline: blake2b-256 hashes of every intermediate
// of a fixed-seed keygen -> encode -> encrypt -> multiply -> relinearize ->
// (rescale|modswitch) -> rotate -> decrypt -> decode pipeline at n=4096 for
// all three schemes (VERDICT r3 item 1 / missing #2: pin bit-exactness at a
// production-adjacent size, not just n=64).
//
// Hashes instead of full dumps keep the committed JSON small; the test
// (tests/test_pipeline_n4096.py) recomputes each stage with seal_tpu and
// compares hashlib.blake2b(data, digest_size=32) of the same u64 layout.
#include <cstdio>
#include <cstdint>
#include <cmath>
#include <vector>
#include <complex>
#include "seal/seal.h"
#include "seal/util/hash.h"

using namespace seal;
using namespace std;

static void hash_u64s(const char *name, const uint64_t *data, size_t n)
{
    util::HashFunction::hash_block_type h{};
    util::HashFunction::hash(data, n, h);
    printf("  \"%s\": \"%016llx%016llx%016llx%016llx\",\n", name,
           (unsigned long long)h[0], (unsigned long long)h[1],
           (unsigned long long)h[2], (unsigned long long)h[3]);
}

static void hash_ct(const char *name, const Ciphertext &ct)
{
    hash_u64s(name, ct.data(),
              ct.size() * ct.poly_modulus_degree() * ct.coeff_modulus_size());
}

static void hash_kswitch(const char *name, const KSwitchKeys &ks, size_t idx)
{
    // concatenate each decomposition ciphertext's words in order
    vector<uint64_t> all;
    for (const auto &pk : ks.data()[idx])
    {
        const auto &c = pk.data();
        size_t w = c.size() * c.poly_modulus_degree() * c.coeff_modulus_size();
        all.insert(all.end(), c.data(), c.data() + w);
    }
    hash_u64s(name, all.data(), all.size());
}

int main()
{
    prng_seed_type seed{ 1, 2, 3, 4, 5, 6, 7, 8 };
    const size_t n = 4096;
    printf("{\n  \"n\": %zu,\n", n);

    // ---------------- BFV ----------------
    {
        EncryptionParameters parms(scheme_type::bfv);
        parms.set_poly_modulus_degree(n);
        parms.set_coeff_modulus(CoeffModulus::Create(n, { 40, 40, 40, 40 }));
        parms.set_plain_modulus(PlainModulus::Batching(n, 20));
        parms.set_random_generator(make_shared<Blake2xbPRNGFactory>(seed));
        SEALContext ctx(parms, true, sec_level_type::none);
        printf("  \"bfv_plain_modulus\": %llu,\n",
               (unsigned long long)parms.plain_modulus().value());

        KeyGenerator kg(ctx);
        hash_u64s("bfv_secret_key", kg.secret_key().data().data(), n * 4);
        PublicKey pk; kg.create_public_key(pk);
        hash_ct("bfv_public_key", pk.data());
        RelinKeys rk; kg.create_relin_keys(rk);
        hash_kswitch("bfv_relin_key", rk, 0);
        GaloisKeys gk;
        kg.create_galois_keys(vector<int>{ 1, -1 }, gk);

        BatchEncoder be(ctx);
        uint64_t t = parms.plain_modulus().value();
        vector<uint64_t> v1(n), v2(n);
        for (size_t i = 0; i < n; i++)
        {
            v1[i] = (i * 7 + 3) % t;
            v2[i] = (i * i + 11) % t;
        }
        Plaintext p1, p2;
        be.encode(v1, p1);
        be.encode(v2, p2);
        hash_u64s("bfv_plain1", p1.data(), p1.coeff_count());
        hash_u64s("bfv_plain2", p2.data(), p2.coeff_count());

        Encryptor enc(ctx, pk);
        enc.set_secret_key(kg.secret_key());
        Decryptor dec(ctx, kg.secret_key());
        Evaluator ev(ctx);
        Ciphertext c1, c2;
        enc.encrypt(p1, c1);
        enc.encrypt(p2, c2);
        hash_ct("bfv_ct1", c1);
        hash_ct("bfv_ct2", c2);
        Ciphertext csym;
        enc.encrypt_symmetric(p1, csym);
        hash_ct("bfv_ct1_sym", csym);

        Ciphertext cm; ev.multiply(c1, c2, cm);
        hash_ct("bfv_mul", cm);
        Ciphertext cr; ev.relinearize(cm, rk, cr);
        hash_ct("bfv_relin", cr);
        Ciphertext cs; ev.mod_switch_to_next(cr, cs);
        hash_ct("bfv_modswitch", cs);
        Ciphertext crot; ev.rotate_rows(cr, 1, gk, crot);
        hash_ct("bfv_rot1", crot);
        Plaintext pd; dec.decrypt(cs, pd);
        hash_u64s("bfv_decrypted", pd.data(), pd.coeff_count());
        vector<uint64_t> out; be.decode(pd, out);
        hash_u64s("bfv_decoded", out.data(), out.size());
        printf("  \"bfv_noise_budget\": %d,\n", dec.invariant_noise_budget(cs));
    }

    // ---------------- CKKS ----------------
    {
        EncryptionParameters parms(scheme_type::ckks);
        parms.set_poly_modulus_degree(n);
        parms.set_coeff_modulus(CoeffModulus::Create(n, { 40, 40, 40, 40 }));
        parms.set_random_generator(make_shared<Blake2xbPRNGFactory>(seed));
        SEALContext ctx(parms, true, sec_level_type::none);
        double scale = pow(2.0, 30);

        KeyGenerator kg(ctx);
        hash_u64s("ckks_secret_key", kg.secret_key().data().data(), n * 4);
        PublicKey pk; kg.create_public_key(pk);
        hash_ct("ckks_public_key", pk.data());
        RelinKeys rk; kg.create_relin_keys(rk);
        hash_kswitch("ckks_relin_key", rk, 0);
        GaloisKeys gk;
        kg.create_galois_keys(vector<uint32_t>{ 3, (uint32_t)(2 * n - 1) }, gk);

        CKKSEncoder ce(ctx);
        size_t slots = ce.slot_count();
        // rational inputs: identical IEEE op order replays in Python
        vector<complex<double>> v1(slots), v2(slots);
        for (size_t i = 0; i < slots; i++)
        {
            v1[i] = complex<double>((double)(i % 97) / 97.0 - 0.3,
                                    (double)(i % 31) / 31.0);
            v2[i] = complex<double>((double)(i % 53) / 53.0,
                                    (double)(i % 13) / 13.0 - 0.5);
        }
        Plaintext p1, p2;
        ce.encode(v1, scale, p1);
        ce.encode(v2, scale, p2);
        hash_u64s("ckks_plain1", p1.data(), n * 3);
        hash_u64s("ckks_plain2", p2.data(), n * 3);

        Encryptor enc(ctx, pk);
        Decryptor dec(ctx, kg.secret_key());
        Evaluator ev(ctx);
        Ciphertext c1, c2;
        enc.encrypt(p1, c1);
        enc.encrypt(p2, c2);
        hash_ct("ckks_ct1", c1);
        hash_ct("ckks_ct2", c2);

        Ciphertext cm; ev.multiply(c1, c2, cm);
        hash_ct("ckks_mul", cm);
        Ciphertext cr; ev.relinearize(cm, rk, cr);
        hash_ct("ckks_relin", cr);
        Ciphertext cs; ev.rescale_to_next(cr, cs);
        hash_ct("ckks_rescale", cs);
        printf("  \"ckks_rescale_scale\": %.17g,\n", cs.scale());
        Ciphertext crot; ev.rotate_vector(c1, 1, gk, crot);
        hash_ct("ckks_rot1", crot);
        Ciphertext cconj; ev.complex_conjugate(c1, gk, cconj);
        hash_ct("ckks_conj", cconj);
        Plaintext pd; dec.decrypt(cs, pd);
        hash_u64s("ckks_decrypted", pd.data(), n * 2);
        vector<complex<double>> out;
        ce.decode(pd, out);
        // hash the decode doubles' bit patterns (re,im interleaved)
        hash_u64s("ckks_decoded_bits",
                  reinterpret_cast<const uint64_t *>(out.data()), 2 * slots);
    }

    // ---------------- BGV ----------------
    {
        EncryptionParameters parms(scheme_type::bgv);
        parms.set_poly_modulus_degree(n);
        parms.set_coeff_modulus(CoeffModulus::Create(n, { 40, 40, 40, 40 }));
        parms.set_plain_modulus(PlainModulus::Batching(n, 20));
        parms.set_random_generator(make_shared<Blake2xbPRNGFactory>(seed));
        SEALContext ctx(parms, true, sec_level_type::none);

        KeyGenerator kg(ctx);
        hash_u64s("bgv_secret_key", kg.secret_key().data().data(), n * 4);
        PublicKey pk; kg.create_public_key(pk);
        hash_ct("bgv_public_key", pk.data());
        RelinKeys rk; kg.create_relin_keys(rk);
        hash_kswitch("bgv_relin_key", rk, 0);
        GaloisKeys gk;
        kg.create_galois_keys(vector<int>{ 1 }, gk);

        BatchEncoder be(ctx);
        uint64_t t = parms.plain_modulus().value();
        vector<uint64_t> v1(n), v2(n);
        for (size_t i = 0; i < n; i++)
        {
            v1[i] = (i * 5 + 1) % t;
            v2[i] = (i * 3 + 7) % t;
        }
        Plaintext p1, p2;
        be.encode(v1, p1);
        be.encode(v2, p2);
        hash_u64s("bgv_plain1", p1.data(), p1.coeff_count());

        Encryptor enc(ctx, pk);
        Decryptor dec(ctx, kg.secret_key());
        Evaluator ev(ctx);
        Ciphertext c1, c2;
        enc.encrypt(p1, c1);
        enc.encrypt(p2, c2);
        hash_ct("bgv_ct1", c1);

        Ciphertext cm; ev.multiply(c1, c2, cm);
        hash_ct("bgv_mul", cm);
        Ciphertext cr; ev.relinearize(cm, rk, cr);
        hash_ct("bgv_relin", cr);
        Ciphertext cs; ev.mod_switch_to_next(cr, cs);
        hash_ct("bgv_modswitch", cs);
        Ciphertext crot; ev.rotate_rows(c1, 1, gk, crot);
        hash_ct("bgv_rot1", crot);
        Plaintext pd; dec.decrypt(cs, pd);
        hash_u64s("bgv_decrypted", pd.data(), pd.coeff_count());
        vector<uint64_t> out; be.decode(pd, out);
        hash_u64s("bgv_decoded", out.data(), out.size());
    }

    // ---------------- multiparty (fork surface) at n=4096 ----------------
    {
        const int parties = 3;
        auto make_parms = [&](uint64_t s0) {
            EncryptionParameters parms(scheme_type::bfv);
            parms.set_poly_modulus_degree(n);
            parms.set_coeff_modulus(CoeffModulus::Create(n, { 40, 40, 40 }));
            parms.set_plain_modulus(PlainModulus::Batching(n, 20));
            prng_seed_type s{ s0, 2, 3, 4, 5, 6, 7, 8 };
            parms.set_random_generator(make_shared<Blake2xbPRNGFactory>(s));
            return parms;
        };
        vector<SEALContext> ctxs;
        for (int i = 0; i < parties; i++)
            ctxs.emplace_back(make_parms(10 + i), true, sec_level_type::none);
        vector<unique_ptr<KeyGenerator>> kgs;
        for (int i = 0; i < parties; i++)
            kgs.push_back(make_unique<KeyGenerator>(ctxs[i]));
        vector<SecretKey> sks(parties);
        for (int i = 0; i < parties; i++)
        {
            kgs[i]->gen_secret_key(sks[i]);
            char buf[32];
            snprintf(buf, sizeof(buf), "mp_sk%d", i);
            hash_u64s(buf, sks[i].data().data(), n * 3);
        }
        vector<PublicKey> pks(parties);
        kgs[0]->create_public_key_with_sk(pks[0], sks[0]);
        for (int i = 1; i < parties; i++)
            kgs[i]->create_public_key_with_same_c1(pks[0], pks[i], sks[i]);
        PublicKey cpk;
        kgs[0]->create_common_public_key(cpk, pks, parties);
        hash_ct("mp_cpk", cpk.data());
        SecretKey csk;
        kgs[0]->create_common_secret_key(csk, sks, parties);
        hash_u64s("mp_csk", csk.data().data(), n * 3);

        Encryptor enc(ctxs[0], cpk);
        BatchEncoder be(ctxs[0]);
        uint64_t t = ctxs[0].first_context_data()->parms().plain_modulus().value();
        vector<uint64_t> v(n);
        for (size_t i = 0; i < n; i++) v[i] = (i * 9 + 2) % t;
        Plaintext p;
        be.encode(v, p);
        Ciphertext ct;
        enc.encrypt(p, ct);
        hash_ct("mp_ct", ct);
        vector<Ciphertext> partials(parties);
        for (int i = 0; i < parties; i++)
        {
            Decryptor d(ctxs[i], sks[i]);
            d.distributed_decrypt(ct, partials[i]);
            char buf[32];
            snprintf(buf, sizeof(buf), "mp_partial%d", i);
            hash_u64s(buf, partials[i].data(1),
                      ct.poly_modulus_degree() * ct.coeff_modulus_size());
        }
        Decryptor d0(ctxs[0], sks[0]);
        Plaintext out;
        d0.aggregate_partial_decryption(ct, partials, out, parties);
        hash_u64s("mp_aggregated_plain", out.data(), out.coeff_count());
    }

    printf("  \"seed\": [1,2,3,4,5,6,7,8]\n}\n");
    return 0;
}
