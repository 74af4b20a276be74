// Noise-budget-vs-chain-depth golden sweep (decryptor.h:102,
// examples/3_levels.cpp): a full n=8192 BFV chain under a fixed PRNG,
// recording Decryptor::invariant_noise_budget after every op — fresh
// encrypt, then per level: multiply, relinearize, mod_switch_to_next.
// tests/test_noise_budget_chain.py asserts equality at every step.
#include <cstdio>
#include <vector>
#include "seal/seal.h"

using namespace seal;
using namespace std;

int main()
{
    EncryptionParameters parms(scheme_type::bfv);
    parms.set_poly_modulus_degree(8192);
    parms.set_coeff_modulus(CoeffModulus::Create(8192, { 43, 43, 43, 43, 46 }));
    parms.set_plain_modulus(PlainModulus::Batching(8192, 20));
    prng_seed_type seed{ 1, 2, 3, 4, 5, 6, 7, 8 };
    parms.set_random_generator(make_shared<Blake2xbPRNGFactory>(seed));
    SEALContext context(parms, true, sec_level_type::tc128);

    KeyGenerator keygen(context);
    PublicKey pk;
    keygen.create_public_key(pk);
    RelinKeys rk;
    keygen.create_relin_keys(rk);
    Encryptor enc(context, pk);
    Evaluator ev(context);
    Decryptor dec(context, keygen.secret_key());
    BatchEncoder encoder(context);

    vector<uint64_t> vals(encoder.slot_count());
    for (size_t i = 0; i < vals.size(); i++)
        vals[i] = i % 7;
    Plaintext p1;
    encoder.encode(vals, p1);
    Ciphertext ct;
    enc.encrypt(p1, ct);

    printf("{\n  \"steps\": [\n");
    printf("    [\"fresh\", %d]", dec.invariant_noise_budget(ct));
    auto cd = context.get_context_data(ct.parms_id());
    while (true)
    {
        ev.multiply_inplace(ct, ct);
        printf(",\n    [\"multiply\", %d]", dec.invariant_noise_budget(ct));
        ev.relinearize_inplace(ct, rk);
        printf(",\n    [\"relinearize\", %d]", dec.invariant_noise_budget(ct));
        auto next = context.get_context_data(ct.parms_id())->next_context_data();
        if (!next)
            break;
        ev.mod_switch_to_next_inplace(ct);
        printf(",\n    [\"mod_switch\", %d]", dec.invariant_noise_budget(ct));
        if (dec.invariant_noise_budget(ct) <= 0)
            break;
    }
    printf("\n  ]\n}\n");
    return 0;
}
