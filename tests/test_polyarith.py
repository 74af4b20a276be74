"""Coefficient-wise polynomial ops mod q — exact-value ports of the
reference util-layer suite (native/tests/seal/util/polyarithsmallmod.cpp:
ModuloPolyCoeffs, NegatePolyCoeffMod, Add/SubPolyCoeffMod,
MultiplyPolyScalarCoeffMod, MultiplyPolyMonoCoeffMod, DyadicProductCoeffMod,
NegacyclicShiftPolyCoeffMod, PolyInftyNormCoeffMod) against seal_tpu's
vectorized modring layer, plus the Evaluator multiply_plain monomial fast
path (evaluator.cpp:1884-1930) checked bit-identical to the NTT route."""

import numpy as np

from seal_tpu.ops import limb, modring


def _poly(vals, L=1):
    n = len(vals) // L if L > 1 else len(vals)
    return limb.arr_to_u64([int(v) for v in vals], shape=(L, n))


def _ints(pair):
    lo, hi = np.asarray(pair[0], dtype=np.uint64), np.asarray(pair[1], dtype=np.uint64)
    return ((hi << np.uint64(32)) | lo).tolist()


def test_modulo_poly_coeffs():
    mc = modring.make_mod_consts([15])
    out = modring.modulo_poly_coeffs(_poly([2, 15, 77]), mc)
    assert _ints(out) == [[2, 0, 2]]


def test_negate_poly_coeffmod():
    mc = modring.make_mod_consts([15])
    out = modring.negate_poly(_poly([2, 3, 4]), mc)
    assert _ints(out) == [[13, 12, 11]]
    # negating zero stays zero
    out = modring.negate_poly(_poly([0, 0, 0]), mc)
    assert _ints(out) == [[0, 0, 0]]


def test_add_sub_poly_coeffmod():
    mc = modring.make_mod_consts([5])
    a, b = _poly([1, 3, 4]), _poly([1, 2, 4])
    assert _ints(modring.add_poly(a, b, mc)) == [[2, 0, 3]]
    assert _ints(modring.sub_poly(a, b, mc)) == [[0, 1, 0]]


def test_multiply_poly_scalar_coeffmod():
    mc = modring.make_mod_consts([5])
    op, quot = modring.shoup_pair([[3]], [[5]])
    out = modring.multiply_poly_scalar(_poly([1, 3, 4]), op, quot, mc)
    assert _ints(out) == [[3, 4, 2]]


def test_dyadic_product_coeffmod():
    mc = modring.make_mod_consts([13])
    out = modring.dyadic_product(_poly([1, 1, 1]), _poly([2, 3, 4]), mc)
    assert _ints(out) == [[2, 3, 4]]


def test_negacyclic_shift_zero_is_identity():
    mc = modring.make_mod_consts([10])
    a = _poly([1, 2, 3, 4])
    out = modring.negacyclic_shift_poly(a, 0, mc)
    assert _ints(out) == [[1, 2, 3, 4]]


def test_negacyclic_shift_wraps_with_negation():
    # (1 + 2x + 3x^2 + 4x^3)·x mod (x^4+1, 10): x^4 = -1 so the top
    # coefficient wraps negated: -4 + x + 2x^2 + 3x^3
    mc = modring.make_mod_consts([10])
    a = _poly([1, 2, 3, 4])
    assert _ints(modring.negacyclic_shift_poly(a, 1, mc)) == [[6, 1, 2, 3]]
    assert _ints(modring.negacyclic_shift_poly(a, 3, mc)) == [[8, 7, 6, 1]]


def test_negacyclic_shift_zero_coeff_stays_zero():
    # reference keeps 0 as 0 (not q - 0) on the wrapped prefix
    mc = modring.make_mod_consts([10])
    a = _poly([1, 2, 3, 0])
    assert _ints(modring.negacyclic_shift_poly(a, 1, mc)) == [[0, 1, 2, 3]]


def test_negacyclic_multiply_mono():
    # (1 + 2x + 3x^2 + 4x^3)·(3x^2) mod (x^4+1, 10)
    # = 3x^2 + 6x^3 + 9x^4 + 12x^5 = -9 - 12x + 3x^2 + 6x^3
    mc = modring.make_mod_consts([10])
    op, quot = modring.shoup_pair([[3]], [[10]])
    out = modring.negacyclic_multiply_mono(_poly([1, 2, 3, 4]), op, quot, 2, mc)
    assert _ints(out) == [[1, 8, 3, 6]]


def test_negacyclic_mono_matches_ntt_route():
    """The monomial path must be bit-identical to NTT→dyadic→INTT for a
    random poly over a real RNS tower (exact integer arithmetic)."""
    from seal_tpu.modulus import CoeffModulus
    from seal_tpu.ops import ntt as ntt_mod

    n, log_n = 64, 6
    qs = [int(m) for m in CoeffModulus.create(n, [30, 30])]
    mc = modring.make_mod_consts(qs)
    tables = ntt_mod.build_device_tables(log_n, qs)
    rng = np.random.default_rng(7)
    x = limb.arr_to_u64(
        [[int(v) for v in rng.integers(0, q, size=n)] for q in qs],
        shape=(2, n))
    c, e = 12345, 17
    op, quot = modring.shoup_pair([[c % q] for q in qs], [[q] for q in qs])
    got = modring.negacyclic_multiply_mono(x, op, quot, e, mc)

    mono = np.zeros((2, n), dtype=np.uint64)
    for i, q in enumerate(qs):
        mono[i, e] = c % q
    mono_ntt = ntt_mod.ntt_forward(limb.arr_to_u64(mono, shape=(2, n)), tables)
    ref = ntt_mod.ntt_inverse(
        modring.dyadic_product(ntt_mod.ntt_forward(x, tables), mono_ntt, mc),
        tables)
    assert np.array_equal(np.asarray(got[0]), np.asarray(ref[0]))
    assert np.array_equal(np.asarray(got[1]), np.asarray(ref[1]))


def test_poly_infty_norm():
    mc = modring.make_mod_consts([10])
    # centered: 0,1,2,3 -> 0,1,2,3; 5,6,9 -> 5,4,1
    out = modring.poly_infty_norm(_poly([0, 1, 2, 3]), mc)
    assert _ints(out) == [[3]]
    out = modring.poly_infty_norm(_poly([1, 6, 9]), mc)
    assert _ints(out) == [[4]]


def test_multiply_plain_monomial_fast_path_bfv():
    """End-to-end: BFV multiply_plain by a monomial (fast O(N) path) equals
    both the expected plaintext product and the generic NTT-route result
    computed on the same ciphertext."""
    from seal_tpu import (
        CoeffModulus, Decryptor, EncryptionParameters, Encryptor, Evaluator,
        KeyGenerator, Plaintext, SEALContext, SecLevelType, SchemeType,
    )
    from seal_tpu.dtypes import stack_polys
    from seal_tpu.evaluator import _plain_to_rns_rows
    from seal_tpu.dtypes import to_device
    from seal_tpu.ops import ntt as ntt_mod

    parms = EncryptionParameters(SchemeType.BFV)
    parms.set_poly_modulus_degree(64)
    parms.set_coeff_modulus(CoeffModulus.create(64, [40, 40, 40]))
    parms.set_plain_modulus(257)
    parms.set_random_seed((1, 2, 3, 4, 5, 6, 7, 8))
    ctx = SEALContext(parms, sec_level=SecLevelType.NONE)
    kg = KeyGenerator(ctx)
    enc = Encryptor(ctx, kg.create_public_key())
    ev = Evaluator(ctx)
    dec = Decryptor(ctx, kg.secret_key())

    ct = enc.encrypt(Plaintext.from_hex_string("5x^3 + 2x^1 + 3"))
    mono = Plaintext.from_hex_string("3x^2")
    out = ev.multiply_plain(ct, mono)
    # (5x^3 + 2x + 3)·3x^2 = 15x^5 + 6x^3 + 9x^2
    assert dec.decrypt(out).to_hex_string() == "Fx^5 + 6x^3 + 9x^2"

    # bit-compare the fast path against the generic NTT route
    cd = ctx.get_context_data(ct.parms_id)
    rows = _plain_to_rns_rows(mono, cd)
    plain_ntt = ntt_mod.ntt_forward(to_device(rows), cd.ntt_tables)
    from seal_tpu.ops import modring as mr
    ref_polys = []
    for j in range(ct.size):
        cj = ntt_mod.ntt_forward(ct.poly(j), cd.ntt_tables)
        cj = mr.dyadic_product(cj, plain_ntt, cd.mod_consts)
        ref_polys.append(ntt_mod.ntt_inverse(cj, cd.ntt_tables))
    ref = ct.copy()
    ref.data = stack_polys(ref_polys)
    assert np.array_equal(out.to_numpy(), ref.to_numpy())
