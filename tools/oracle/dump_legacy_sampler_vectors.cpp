// Dumps golden vectors for the legacy SEAL 3.4/3.5 uniform samplers
// (util/rlwe.cpp sample_poly_uniform_seal_3_4/_3_5) under a fixed
// blake2xb PRNG seed. Consumed by tests/test_randomgen.py.
#include <cstdio>
#include <cstdint>
#include "seal/seal.h"
#include "seal/util/rlwe.h"

using namespace seal;
using namespace std;

static void dump_u64s(const char *name, const uint64_t *data, size_t n, bool last = false)
{
    printf("  \"%s\": [", name);
    for (size_t i = 0; i < n; i++)
        printf("%llu%s", (unsigned long long)data[i], i + 1 == n ? "" : ",");
    printf("]%s\n", last ? "" : ",");
}

int main()
{
    EncryptionParameters parms(scheme_type::bfv);
    size_t n = 64;
    parms.set_poly_modulus_degree(n);
    parms.set_coeff_modulus(CoeffModulus::Create(n, { 40, 41 }));
    parms.set_plain_modulus(257);
    prng_seed_type seed{ 9, 8, 7, 6, 5, 4, 3, 2 };

    size_t L = parms.coeff_modulus().size();
    std::vector<uint64_t> dest(L * n);

    printf("{\n");
    {
        auto prng = Blake2xbPRNGFactory(seed).create();
        util::sample_poly_uniform_seal_3_4(prng, parms, dest.data());
        dump_u64s("seal_3_4", dest.data(), dest.size());
    }
    {
        auto prng = Blake2xbPRNGFactory(seed).create();
        util::sample_poly_uniform_seal_3_5(prng, parms, dest.data());
        dump_u64s("seal_3_5", dest.data(), dest.size());
    }
    {
        // large-n current sampler: exercises the rejection path ordering
        EncryptionParameters big(scheme_type::bfv);
        size_t bn = 4096;
        big.set_poly_modulus_degree(bn);
        big.set_coeff_modulus(CoeffModulus::Create(bn, { 48, 48 }));
        big.set_plain_modulus(257);
        std::vector<uint64_t> bdest(2 * bn);
        auto prng = Blake2xbPRNGFactory(seed).create();
        util::sample_poly_uniform(prng, big, bdest.data());
        // dump a digest-friendly slice plus full checksum
        unsigned long long sum = 0;
        for (auto v : bdest) sum += v;
        dump_u64s("uniform_4096_head", bdest.data(), 32);
        dump_u64s("uniform_4096_tail", bdest.data() + bdest.size() - 32, 32);
        printf("  \"uniform_4096_sum\": %llu\n", sum);
    }
    printf("}\n");
    return 0;
}
