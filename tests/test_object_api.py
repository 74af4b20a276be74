"""Object-level API families from the reference suite
(native/tests/seal/encryptor.cpp: {BFV,BGV,CKKS}EncryptZeroDecrypt;
ciphertext.cpp: CiphertextBasics; batchencoder.cpp: BatchUnbatchIntVector;
keygenerator.cpp: Constructors)."""

import numpy as np
import pytest

from seal_tpu import (
    BatchEncoder,
    CoeffModulus,
    Decryptor,
    EncryptionParameters,
    Encryptor,
    Evaluator,
    KeyGenerator,
    Plaintext,
    SEALContext,
    SchemeType,
    SecLevelType,
)
from seal_tpu.ckks import CKKSEncoder

SEED = (1, 2, 3, 4, 5, 6, 7, 8)


def _ctx(scheme, plain_mod=None, bits=(40, 40, 40), n=64):
    parms = EncryptionParameters(scheme)
    parms.set_poly_modulus_degree(n)
    parms.set_coeff_modulus(CoeffModulus.create(n, list(bits)))
    if plain_mod is not None:
        parms.set_plain_modulus(plain_mod)
    parms.set_random_seed(SEED)
    return SEALContext(parms, sec_level=SecLevelType.NONE)


class TestEncryptZero:
    """EncryptZeroDecrypt families: asymmetric + symmetric, first and
    second chain level (encryptor.cpp:331-578)."""

    def test_bfv_encrypt_zero_decrypts_to_zero(self):
        ctx = _ctx(SchemeType.BFV, plain_mod=257)
        kg = KeyGenerator(ctx)
        enc = Encryptor(ctx, kg.create_public_key(), kg.secret_key())
        dec = Decryptor(ctx, kg.secret_key())
        for asym in (True, False):
            ct = enc.encrypt_zero(asymmetric=asym)
            assert not ct.is_transparent()
            assert dec.decrypt(ct).to_hex_string() == "0"

    def test_bfv_encrypt_zero_second_level(self):
        ctx = _ctx(SchemeType.BFV, plain_mod=257)
        kg = KeyGenerator(ctx)
        enc = Encryptor(ctx, kg.create_public_key(), kg.secret_key())
        dec = Decryptor(ctx, kg.secret_key())
        second = ctx.first_context_data().next_context_data
        ct = enc.encrypt_zero(parms_id=second.parms_id)
        assert tuple(ct.parms_id) == tuple(second.parms_id)
        assert dec.decrypt(ct).to_hex_string() == "0"

    def test_bgv_encrypt_zero_decrypts_to_zero(self):
        ctx = _ctx(SchemeType.BGV, plain_mod=257)
        kg = KeyGenerator(ctx)
        enc = Encryptor(ctx, kg.create_public_key(), kg.secret_key())
        dec = Decryptor(ctx, kg.secret_key())
        for asym in (True, False):
            ct = enc.encrypt_zero(asymmetric=asym)
            assert dec.decrypt(ct).to_hex_string() == "0"

    def test_ckks_encrypt_zero_scale_carries(self):
        ctx = _ctx(SchemeType.CKKS, bits=(40, 40, 40))
        kg = KeyGenerator(ctx)
        enc = Encryptor(ctx, kg.create_public_key(), kg.secret_key())
        dec = Decryptor(ctx, kg.secret_key())
        encoder = CKKSEncoder(ctx)
        ct = enc.encrypt_zero()
        ct.scale = 2.0 ** 30
        out = encoder.decode(dec.decrypt(ct))
        assert np.max(np.abs(out)) < 1e-4


class TestCiphertextBasics:
    """CiphertextBasics parity (ciphertext.cpp:18-92): shape metadata,
    copy independence, transparency flag."""

    def test_shape_metadata(self):
        ctx = _ctx(SchemeType.BFV, plain_mod=257)
        kg = KeyGenerator(ctx)
        enc = Encryptor(ctx, kg.create_public_key())
        ct = enc.encrypt(Plaintext.from_hex_string("7"))
        assert ct.size == 2
        assert ct.coeff_modulus_size == 2  # 3 primes -> 2 data primes
        assert ct.poly_modulus_degree == 64
        assert tuple(ct.parms_id) == tuple(ctx.first_parms_id)

    def test_copy_is_independent(self):
        ctx = _ctx(SchemeType.BFV, plain_mod=257)
        kg = KeyGenerator(ctx)
        enc = Encryptor(ctx, kg.create_public_key())
        ev = Evaluator(ctx)
        ct = enc.encrypt(Plaintext.from_hex_string("7"))
        cp = ct.copy()
        neg = ev.negate(ct)
        # negating via a new object leaves the copy untouched
        assert np.array_equal(cp.to_numpy(), ct.to_numpy())
        assert not np.array_equal(neg.to_numpy(), ct.to_numpy())

    def test_multiply_grows_size(self):
        ctx = _ctx(SchemeType.BFV, plain_mod=257)
        kg = KeyGenerator(ctx)
        enc = Encryptor(ctx, kg.create_public_key())
        ev = Evaluator(ctx)
        ct = enc.encrypt(Plaintext.from_hex_string("2"))
        cm = ev.multiply(ct, ct)
        assert cm.size == 3
        cm2 = ev.multiply(cm, ct)
        assert cm2.size == 4


class TestBatchEncoderSigned:
    """BatchUnbatchIntVector parity (batchencoder.cpp:70-127)."""

    def test_signed_roundtrip(self):
        ctx = _ctx(SchemeType.BFV, plain_mod=257)
        encoder = BatchEncoder(ctx)
        vals = [0, 1, -1, 2, -2, 100, -100] + [0] * (encoder.slot_count - 7)
        p = encoder.encode(vals)
        out = encoder.decode(p, signed=True)
        assert list(out[:7]) == [0, 1, -1, 2, -2, 100, -100]

    def test_unsigned_roundtrip(self):
        ctx = _ctx(SchemeType.BFV, plain_mod=257)
        encoder = BatchEncoder(ctx)
        vals = list(range(encoder.slot_count))
        assert np.array_equal(encoder.decode(encoder.encode(vals)), vals)


class TestKeyGeneratorConstructors:
    """Constructors parity (keygenerator.cpp:450+): a KeyGenerator rebuilt
    from an existing secret key reproduces working keys."""

    def test_rebuild_from_secret_key(self):
        ctx = _ctx(SchemeType.BFV, plain_mod=257)
        kg1 = KeyGenerator(ctx)
        sk = kg1.secret_key()
        kg2 = KeyGenerator(ctx, sk)
        enc = Encryptor(ctx, kg2.create_public_key())
        dec = Decryptor(ctx, sk)
        rk = kg2.create_relin_keys()
        ev = Evaluator(ctx)
        ct = enc.encrypt(Plaintext.from_hex_string("5"))
        out = ev.relinearize(ev.multiply(ct, ct), rk)
        assert dec.decrypt(out).to_hex_string() == "19"  # 25


class TestLazySecretKey:
    """The native sampling path returns a SecretKey whose device pair is
    lazy (r4 host-API work): pure-host flows — public-key creation,
    serialization, native decrypt — must not force materialization, and
    first device use must produce the identical pair."""

    def test_stays_lazy_through_host_flows(self):
        from seal_tpu.dtypes import _LazyHostData
        from seal_tpu.serialization import load_secret_key, save_secret_key

        ctx = _ctx(SchemeType.BFV, plain_mod=257)
        kg = KeyGenerator(ctx)
        sk = kg.secret_key()
        if type(sk._data) is not _LazyHostData:
            pytest.skip("native library unavailable — sk is eager")
        blob = save_secret_key(sk)
        kg.create_public_key()
        enc = Encryptor(ctx, sk)
        ct = enc.encrypt_symmetric(Plaintext.from_hex_string("7"))
        dec = Decryptor(ctx, sk)
        assert dec.decrypt(ct).to_hex_string() == "7"
        assert type(sk._data) is _LazyHostData, "host flows forced to_device"
        sk2 = load_secret_key(ctx, blob)
        assert np.array_equal(sk.to_numpy(), sk2.to_numpy())

    def test_device_materialization_matches_host(self):
        from seal_tpu.dtypes import to_host

        ctx = _ctx(SchemeType.BFV, plain_mod=257)
        sk = KeyGenerator(ctx).secret_key()
        host = np.array(sk.to_numpy())          # via host mirror when lazy
        dev = to_host(sk.data)                  # forces materialization
        assert np.array_equal(host, dev)
        # relin keys built AFTER materialization still work
        kg2 = KeyGenerator(ctx, sk)
        rk = kg2.create_relin_keys()
        enc = Encryptor(ctx, kg2.create_public_key())
        dec = Decryptor(ctx, sk)
        ev = Evaluator(ctx)
        ct = enc.encrypt(Plaintext.from_hex_string("5"))
        assert dec.decrypt(ev.relinearize(ev.multiply(ct, ct), rk)).to_hex_string() == "19"


class TestInplaceVariants:
    """evaluator.h declares an `*_inplace` overload per op; seal_tpu's
    wrappers rebind the functional result onto the argument so reference
    call sites port verbatim (docs/MIGRATING.md)."""

    def test_bfv_inplace_chain_matches_functional(self):
        ctx = _ctx(SchemeType.BFV, plain_mod=257)
        kg = KeyGenerator(ctx)
        enc = Encryptor(ctx, kg.create_public_key())
        dec = Decryptor(ctx, kg.secret_key())
        rk = kg.create_relin_keys()
        ev = Evaluator(ctx)
        ct = enc.encrypt(Plaintext.from_hex_string("5"))
        want = ev.relinearize(ev.multiply(ct, ct), rk)
        c = enc.encrypt(Plaintext.from_hex_string("5"))
        r1 = ev.multiply_inplace(c, c)
        assert r1 is c
        ev.relinearize_inplace(c, rk)
        assert np.array_equal(np.asarray(c.data[0]), np.asarray(want.data[0]))
        assert dec.decrypt(c).to_hex_string() == "19"

    def test_inplace_noop_path_preserves_object(self):
        """mod_switch_to at the current level returns the input itself;
        the inplace wrapper must not clear the shared __dict__."""
        ctx = _ctx(SchemeType.BFV, plain_mod=257)
        kg = KeyGenerator(ctx)
        enc = Encryptor(ctx, kg.create_public_key())
        dec = Decryptor(ctx, kg.secret_key())
        ev = Evaluator(ctx)
        ct = enc.encrypt(Plaintext.from_hex_string("5"))
        out = ev.mod_switch_to_inplace(ct, ct.parms_id)
        assert out is ct and ct.size == 2
        assert dec.decrypt(ct).to_hex_string() == "5"

    def test_ckks_inplace_rescale_and_rotate(self):
        ctx = _ctx(SchemeType.CKKS)
        kg = KeyGenerator(ctx)
        enc = Encryptor(ctx, kg.create_public_key())
        dec = Decryptor(ctx, kg.secret_key())
        rk = kg.create_relin_keys()
        gk = kg.create_galois_keys([3])
        ev = Evaluator(ctx)
        ce = CKKSEncoder(ctx)
        x = np.linspace(0.1, 1.0, ce.slot_count)
        c = enc.encrypt(ce.encode(x, 2.0**30))
        ev.square_inplace(c)
        ev.relinearize_inplace(c, rk)
        ev.rescale_to_next_inplace(c)
        ev.rotate_vector_inplace(c, 1, gk)
        got = np.real(ce.decode(dec.decrypt(c)))
        assert np.max(np.abs(got - np.roll(x * x, -1))) < 1e-3


def test_encrypt_zero_symmetric_alias():
    """encryptor.h encrypt_zero_symmetric — alias over
    encrypt_zero(asymmetric=False); decrypts to zero."""
    ctx = _ctx(SchemeType.BFV, plain_mod=257)
    kg = KeyGenerator(ctx)
    enc = Encryptor(ctx, kg.create_public_key(), kg.secret_key())
    dec = Decryptor(ctx, kg.secret_key())
    ct = enc.encrypt_zero_symmetric()
    assert dec.decrypt(ct).is_zero()


def test_plaintext_zero_and_counts():
    """plaintext.h set_zero / nonzero_coeff_count / significant_coeff_count."""
    p = Plaintext.from_hex_string("3x^2 + 1")
    assert p.significant_coeff_count() == 3
    assert p.nonzero_coeff_count() == 2
    p.set_zero()
    assert p.is_zero() and p.nonzero_coeff_count() == 0


def test_create_galois_keys_from_steps():
    """keygenerator.h create_galois_keys(steps) overload: steps convert via
    GaloisTool.get_elts_from_steps; keys rotate as requested."""
    ctx = _ctx(SchemeType.BFV, plain_mod=257)
    kg = KeyGenerator(ctx)
    gk = kg.create_galois_keys(steps=[1, -1])
    enc = Encryptor(ctx, kg.create_public_key())
    dec = Decryptor(ctx, kg.secret_key())
    ev = Evaluator(ctx)
    be = BatchEncoder(ctx)
    v = np.arange(be.slot_count, dtype=np.uint64)
    ct = enc.encrypt(be.encode(v))
    half = be.slot_count // 2
    got = np.asarray(be.decode(dec.decrypt(ev.rotate_rows(ct, 1, gk))), np.uint64)
    want = np.concatenate([np.roll(v[:half], -1), np.roll(v[half:], -1)])
    assert np.array_equal(got, want)
    with pytest.raises(ValueError):
        kg.create_galois_keys([3], steps=[1])
