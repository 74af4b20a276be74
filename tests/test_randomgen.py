"""PRNG byte-exactness vs the reference library.

Vectors in tests/vectors/prng.json were dumped by tools/oracle/
dump_prng_vectors.cpp from a build of the reference SEAL 4.0 —
the definitive oracle for SURVEY.md §7 hard part #2 (bit-exact RNG)."""

import pytest
import json
import pathlib

from seal_tpu.randomgen import (
    Blake2xbPRNG,
    PrngType,
    Shake256PRNG,
    UniformRandomGeneratorFactory,
    blake2xb,
)

VECTORS = json.loads((pathlib.Path(__file__).parent / "vectors" / "prng.json").read_text())
SEED = (1, 2, 3, 4, 5, 6, 7, 8)


def test_blake2xb_stream_matches_reference():
    prng = Blake2xbPRNG(SEED)
    buf = prng.generate(8192)
    assert buf[:160].hex() == VECTORS["blake2xb_12345678_first8192"]
    # spans a 4096-byte refill boundary (counter increment)
    assert buf[4090:4106].hex() == VECTORS["blake2xb_12345678_at4090"]


def test_blake2xb_native_matches_python():
    """The 8-way vectorized native XOF expansion vs the pure-Python RFC
    implementation, across refill-counter boundaries."""
    import struct

    from seal_tpu import native

    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    got = native.blake2xb_stream(SEED, 0, 3 * 4096)
    key = b"".join(struct.pack("<Q", s) for s in SEED)
    want = b"".join(
        blake2xb(4096, struct.pack("<Q", c), key) for c in range(3))
    assert got == want


def test_blake2xb_zero_seed():
    prng = Blake2xbPRNG((0,) * 8)
    assert prng.generate(64).hex() == VECTORS["blake2xb_zero_first64"]


def test_shake256_stream_matches_reference():
    prng = Shake256PRNG(SEED)
    assert prng.generate(64).hex() == VECTORS["shake256_12345678_first64"]


def test_chunked_reads_equal_bulk():
    a = Blake2xbPRNG(SEED)
    b = Blake2xbPRNG(SEED)
    bulk = a.generate(10000)
    chunks = b"".join(b.generate(n) for n in [1, 7, 64, 4000, 4001, 1927])
    assert bulk == chunks


def test_factory():
    f = UniformRandomGeneratorFactory(seed=SEED)
    assert f.create().generate(32) == f.create().generate(32)
    f2 = UniformRandomGeneratorFactory()  # unseeded -> random
    assert f2.create().generate(32) != f2.create().generate(32)
    sh = UniformRandomGeneratorFactory(PrngType.SHAKE256, seed=SEED).create()
    assert isinstance(sh, Shake256PRNG)


def test_parms_id_matches_reference():
    from seal_tpu import CoeffModulus, EncryptionParameters, PlainModulus, SchemeType

    p = EncryptionParameters(SchemeType.BFV)
    p.set_poly_modulus_degree(4096)
    p.set_coeff_modulus(CoeffModulus.bfv_default(4096))
    p.set_plain_modulus(PlainModulus.batching(4096, 20))
    assert list(p.parms_id) == VECTORS["parms_id_bfv_4096_default"]

    p = EncryptionParameters(SchemeType.BFV)
    p.set_poly_modulus_degree(64)
    p.set_coeff_modulus(CoeffModulus.create(64, [40, 40, 40]))
    p.set_plain_modulus(257)
    assert list(p.parms_id) == VECTORS["parms_id_bfv_64_tiny"]

    p = EncryptionParameters(SchemeType.CKKS)
    p.set_poly_modulus_degree(8192)
    p.set_coeff_modulus(CoeffModulus.create(8192, [60, 40, 40, 60]))
    assert list(p.parms_id) == VECTORS["parms_id_ckks_8192"]


class TestLegacySamplers:
    """Golden vectors from the reference's legacy 3.4/3.5 uniform samplers
    and the 4.0 sampler's rejection-path ordering at n=4096
    (tools/oracle/dump_legacy_sampler_vectors.cpp)."""

    @pytest.fixture(scope="class")
    def vectors(self):
        import json, pathlib
        p = pathlib.Path(__file__).parent / "vectors" / "legacy_samplers.json"
        return json.loads(p.read_text())

    def _prng(self):
        from seal_tpu.randomgen import Blake2xbPRNG
        return Blake2xbPRNG((9, 8, 7, 6, 5, 4, 3, 2))

    def _moduli(self, n, bits):
        from seal_tpu.modulus import CoeffModulus
        return [m.value for m in CoeffModulus.create(n, bits)]

    def test_seal_3_4(self, vectors):
        from seal_tpu import rlwe
        out = rlwe.sample_poly_uniform_seal_3_4(self._prng(), self._moduli(64, [40, 41]), 64)
        assert out.reshape(-1).tolist() == vectors["seal_3_4"]

    def test_seal_3_5(self, vectors):
        from seal_tpu import rlwe
        out = rlwe.sample_poly_uniform_seal_3_5(self._prng(), self._moduli(64, [40, 41]), 64)
        assert out.reshape(-1).tolist() == vectors["seal_3_5"]

    def test_uniform_4096_rejection_ordering(self, vectors):
        from seal_tpu import rlwe
        out = rlwe.sample_poly_uniform(self._prng(), self._moduli(4096, [48, 48]), 4096)
        flat = out.reshape(-1)
        assert flat[:32].tolist() == vectors["uniform_4096_head"]
        assert flat[-32:].tolist() == vectors["uniform_4096_tail"]
        assert int(flat.astype(object).sum()) & 0xFFFFFFFFFFFFFFFF == vectors["uniform_4096_sum"]


def test_clipped_normal_sampler():
    """ClipNormal.ClipNormalGenerate parity (util/clipnormal.h, rlwe.cpp:40):
    statistical properties — values clipped to ±6σ, centered, σ≈3.2,
    negative values lifted to q−|v| identically across RNS rows."""
    import numpy as np
    from seal_tpu import rlwe
    from seal_tpu.rlwe import NOISE_MAX_DEVIATION, NOISE_STANDARD_DEVIATION

    n = 4096
    moduli = [0xFFFFEE001, 0xFFFFC4001]
    out = rlwe.sample_poly_normal(Blake2xbPRNG(SEED), moduli, n)
    assert out.shape == (2, n)
    # recover signed values from row 0 and check the clip bound + moments
    q0 = moduli[0]
    signed = np.where(out[0] > q0 // 2, out[0].astype(np.int64) - q0,
                      out[0].astype(np.int64))
    assert np.abs(signed).max() <= NOISE_MAX_DEVIATION
    assert abs(signed.mean()) < 0.5
    assert abs(signed.std() - NOISE_STANDARD_DEVIATION) < 0.4
    # same signed value on every RNS row (lifted per-modulus)
    q1 = moduli[1]
    signed1 = np.where(out[1] > q1 // 2, out[1].astype(np.int64) - q1,
                       out[1].astype(np.int64))
    assert np.array_equal(signed, signed1)
    # deterministic under a fixed seed
    again = rlwe.sample_poly_normal(Blake2xbPRNG(SEED), moduli, n)
    assert np.array_equal(out, again)


def test_shake256_prng_type_end_to_end():
    """parms.set_prng_type(SHAKE256) drives keygen/encrypt and survives the
    seeded-ciphertext wire format (randomgen.h:501-560 Shake256PRNGFactory
    selection parity)."""
    import seal_tpu
    from seal_tpu import serialization
    from seal_tpu.modulus import CoeffModulus
    from seal_tpu.randomgen import PrngType

    n = 64
    parms = seal_tpu.EncryptionParameters(seal_tpu.SchemeType.BFV)
    parms.set_poly_modulus_degree(n)
    parms.set_coeff_modulus(CoeffModulus.create(n, [40, 40]))
    parms.set_plain_modulus(257)
    parms.set_random_seed((1, 2, 3, 4, 5, 6, 7, 8))
    parms.set_prng_type(PrngType.SHAKE256)
    # prng choice must not perturb parms_id (not hashed, like the factory)
    blake = parms.clone()
    blake.set_prng_type(None)
    assert tuple(parms.parms_id) == tuple(blake.parms_id)

    ctx = seal_tpu.SEALContext(parms, sec_level=seal_tpu.SecLevelType.NONE)
    kg = seal_tpu.KeyGenerator(ctx)
    enc = seal_tpu.Encryptor(ctx, kg.create_public_key(), kg.secret_key())
    dec = seal_tpu.Decryptor(ctx, kg.secret_key())
    pt = seal_tpu.Plaintext.from_hex_string("5x^3 + 2x^1 + 1")
    ct = enc.encrypt_symmetric(pt, save_seed=True)
    assert ct.seed_info is not None and ct.seed_info[0] == int(PrngType.SHAKE256)
    blob = serialization.save_ciphertext(ct)
    ct2 = serialization.load_ciphertext(ctx, blob)
    assert dec.decrypt(ct2).to_hex_string() == pt.to_hex_string()

    # a blake2xb context under the same seed must produce a DIFFERENT stream
    ctx_b = seal_tpu.SEALContext(blake, sec_level=seal_tpu.SecLevelType.NONE)
    kg_b = seal_tpu.KeyGenerator(ctx_b)
    import numpy as np
    assert not np.array_equal(
        np.asarray(kg.secret_key().data[0]), np.asarray(kg_b.secret_key().data[0]))
