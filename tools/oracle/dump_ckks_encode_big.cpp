// encode at scale 2^80 (128-bit decompose class) and 2^150 (slow class)
#include <cstdio>
#include <cmath>
#include <vector>
#include <complex>
#include "seal/seal.h"
using namespace seal; using namespace std;
int main(){
    size_t n = 1024;
    EncryptionParameters parms(scheme_type::ckks);
    parms.set_poly_modulus_degree(n);
    parms.set_coeff_modulus(CoeffModulus::Create(n, { 60, 60, 60, 60 }));
    SEALContext ctx(parms, true, sec_level_type::none);
    CKKSEncoder enc(ctx);
    size_t slots = n >> 1;
    vector<complex<double>> v(slots);
    for (size_t i = 0; i < slots; i++)
        v[i] = complex<double>((double)(i % 89) / 89.0 - 0.4, (double)(i % 23) / 23.0);
    printf("{\n");
    for (double lg : {80.0, 150.0}) {
        Plaintext p;
        enc.encode(v, pow(2.0, lg), p);
        printf("  \"plain_%d\": [", (int)lg);
        size_t tot = n * 4;
        for (size_t i = 0; i < tot; i++)
            printf("%llu%s", (unsigned long long)p.data()[i], i + 1 == tot ? "" : ",");
        printf("]%s\n", lg < 150 ? "," : "");
    }
    printf("}\n");
    return 0;
}
