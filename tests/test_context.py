"""EncryptionParameters + SEALContext tests
(parity targets: tests/seal/encryptionparams.cpp, tests/seal/context.cpp)."""

import pytest

from seal_tpu import (
    CoeffModulus,
    EncryptionParameters,
    Modulus,
    PlainModulus,
    SEALContext,
    SchemeType,
    SecLevelType,
)
from seal_tpu.context import ErrorType


def bfv_parms(n=4096, t=None, moduli=None):
    parms = EncryptionParameters(SchemeType.BFV)
    parms.set_poly_modulus_degree(n)
    parms.set_coeff_modulus(moduli or CoeffModulus.bfv_default(n))
    parms.set_plain_modulus(t or PlainModulus.batching(n, 20))
    return parms


def test_parms_id_changes_on_mutation():
    parms = EncryptionParameters(SchemeType.BFV)
    ids = {parms.parms_id}
    parms.set_poly_modulus_degree(4096)
    ids.add(parms.parms_id)
    parms.set_coeff_modulus(CoeffModulus.bfv_default(4096))
    ids.add(parms.parms_id)
    parms.set_plain_modulus(PlainModulus.batching(4096, 20))
    ids.add(parms.parms_id)
    assert len(ids) == 4


def test_parms_id_deterministic_and_scheme_sensitive():
    a, b = bfv_parms(), bfv_parms()
    assert a.parms_id == b.parms_id
    c = EncryptionParameters(SchemeType.BGV)
    c.set_poly_modulus_degree(4096)
    c.set_coeff_modulus(CoeffModulus.bfv_default(4096))
    c.set_plain_modulus(PlainModulus.batching(4096, 20))
    assert c.parms_id != a.parms_id


def test_context_chain_bfv():
    ctx = SEALContext(bfv_parms())
    assert ctx.parameters_set, ctx.parameter_error_message()
    key_cd = ctx.key_context_data()
    first_cd = ctx.first_context_data()
    last_cd = ctx.last_context_data()
    # default n=4096 has 3 primes: key level L=3, data levels L=2 then L=1
    assert key_cd.coeff_modulus_size == 3
    assert first_cd.coeff_modulus_size == 2
    assert last_cd.coeff_modulus_size == 1
    assert ctx.using_keyswitching
    assert key_cd.chain_index == 2 and first_cd.chain_index == 1 and last_cd.chain_index == 0
    # doubly-linked
    assert first_cd.prev_context_data is key_cd
    assert key_cd.next_context_data is first_cd
    assert last_cd.next_context_data is None
    # qualifiers
    q = first_cd.qualifiers
    assert q.using_fft and q.using_ntt and q.using_batching and q.using_fast_plain_lift
    assert q.sec_level == SecLevelType.TC128


def test_context_qualifiers_errors():
    # insecure parameters rejected at TC128
    parms = EncryptionParameters(SchemeType.BFV)
    parms.set_poly_modulus_degree(2048)
    parms.set_coeff_modulus(CoeffModulus.bfv_default(4096))  # too much q for n=2048
    parms.set_plain_modulus(65537)
    ctx = SEALContext(parms)
    assert not ctx.parameters_set
    assert ctx.first_context_data().qualifiers.parameter_error == ErrorType.INVALID_PARAMETERS_INSECURE
    # name/message accessors (context.h:581, context.cpp:21)
    assert ctx.parameter_error_name() == "invalid_parameters_insecure"
    assert ctx.parameter_error_message()
    # same parameters accepted with sec_level none
    ctx = SEALContext(parms, sec_level=SecLevelType.NONE)
    assert ctx.parameters_set
    assert ctx.parameter_error_name() == "success"

    # non-coprime plain modulus
    parms = EncryptionParameters(SchemeType.BFV)
    parms.set_poly_modulus_degree(4096)
    moduli = CoeffModulus.bfv_default(4096)
    parms.set_coeff_modulus(moduli)
    parms.set_plain_modulus(moduli[0])
    ctx = SEALContext(parms)
    assert ctx.first_context_data().qualifiers.parameter_error == ErrorType.INVALID_PLAIN_MODULUS_COPRIMALITY

    # no scheme
    ctx = SEALContext(EncryptionParameters(SchemeType.NONE), sec_level=SecLevelType.NONE)
    assert ctx.first_context_data().qualifiers.parameter_error == ErrorType.INVALID_SCHEME


def test_context_tiny_insecure_parms():
    """n=64 insecure test parms, the reference test-suite workhorse."""
    parms = EncryptionParameters(SchemeType.BFV)
    parms.set_poly_modulus_degree(64)
    parms.set_coeff_modulus(CoeffModulus.create(64, [40, 40, 40]))
    parms.set_plain_modulus(257)  # 257 ≡ 1 mod 128 -> batching enabled
    ctx = SEALContext(parms, sec_level=SecLevelType.NONE)
    assert ctx.parameters_set, ctx.parameter_error_message()
    assert ctx.first_context_data().qualifiers.using_batching


def test_context_bfv_delta_constants():
    ctx = SEALContext(bfv_parms())
    cd = ctx.first_context_data()
    t = cd.parms.plain_modulus.value
    Q = cd.total_coeff_modulus
    delta = Q // t
    assert cd.coeff_div_plain_modulus == [delta % m.value for m in cd.parms.coeff_modulus]
    assert cd.coeff_modulus_mod_plain_modulus == Q % t
    assert cd.plain_upper_half_threshold == (t + 1) // 2


def test_context_ckks():
    parms = EncryptionParameters(SchemeType.CKKS)
    parms.set_poly_modulus_degree(8192)
    parms.set_coeff_modulus(CoeffModulus.create(8192, [60, 40, 40, 60]))
    ctx = SEALContext(parms)
    assert ctx.parameters_set, ctx.parameter_error_message()
    cd = ctx.first_context_data()
    assert cd.plain_upper_half_threshold == 1 << 63
    # stored value is (-2^64) mod q_i: the lift for wrapped negative coeffs
    # (context.cpp:372-378 computes (2^63 mod q)·(q-2) mod q)
    for m, v in zip(cd.parms.coeff_modulus, cd.plain_upper_half_increment):
        assert v == (-(1 << 64)) % m.value
    assert cd.upper_half_threshold == (cd.total_coeff_modulus + 1) // 2
    # CKKS with nonzero plain modulus is invalid
    with pytest.raises(ValueError):
        parms.set_plain_modulus(65537)


def test_context_expand_mod_chain_false():
    ctx = SEALContext(bfv_parms(), expand_mod_chain=False)
    # only key level + first level
    assert ctx.first_context_data().next_context_data is None
    assert ctx.first_parms_id == ctx.last_parms_id


def test_get_context_data_lookup():
    ctx = SEALContext(bfv_parms())
    cd = ctx.get_context_data(ctx.first_parms_id)
    assert cd is ctx.first_context_data()
    assert ctx.get_context_data((1, 2, 3, 4)) is None


def test_hash_function_distinctness():
    """HashTest.Hash parity (tests/seal/util/hash.cpp): the parms_id hash
    distinguishes word counts and values, and is deterministic."""
    from seal_tpu.encryption_params import _hash_u64_words

    h0 = _hash_u64_words([0])
    assert _hash_u64_words([]) != h0
    assert _hash_u64_words([0]) == h0
    assert _hash_u64_words([0, 0]) != h0
    assert _hash_u64_words([0x123456]) != _hash_u64_words([0x023456])
    assert len(h0) == 4 and all(0 <= w < (1 << 64) for w in h0)
