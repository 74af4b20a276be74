"""Sharded-vs-unsharded bit-exactness on a virtual 8-device CPU mesh
(SURVEY.md §4c: integer math makes multi-chip runs exactly comparable)."""

import numpy as np
import pytest

import jax

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
from seal_tpu.parallel import (
    HEMesh,
    batch_ciphertexts,
    shard_ciphertext,
    unbatch_ciphertexts,
    vmap_pipeline,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def bfv():
    parms = EncryptionParameters(SchemeType.BFV)
    parms.set_poly_modulus_degree(64)
    # 2-prime data tower + special prime: the smallest BEHZ graph with a
    # shardable tower (tp=2); keeps cold-compile time bounded
    parms.set_coeff_modulus(CoeffModulus.create(64, [30, 30, 30]))
    parms.set_plain_modulus(257)
    parms.set_random_seed((9, 8, 7, 6, 5, 4, 3, 2))
    ctx = SEALContext(parms, sec_level=SecLevelType.NONE)
    kg = KeyGenerator(ctx)
    pk = kg.create_public_key()
    rk = kg.create_relin_keys()
    return dict(ctx=ctx, kg=kg, pk=pk, rk=rk,
                enc=Encryptor(ctx, pk), dec=Decryptor(ctx, kg.secret_key()),
                ev=Evaluator(ctx))


def test_dp_tp_sharded_pipeline_bitexact(bfv):
    """ONE batched mult+relin executable, compared three ways: per-ct
    sequential (eager), jit(vmap) unsharded, and dp×tp-sharded — all
    bit-identical. Combines what used to be two tests so the expensive
    BEHZ relinearize pipeline compiles once."""
    ev, enc, dec, rk = bfv["ev"], bfv["enc"], bfv["dec"], bfv["rk"]
    B = 2
    cts_a = [enc.encrypt(Plaintext.from_hex_string(f"{2*i+1:X}")) for i in range(B)]
    cts_b = [enc.encrypt(Plaintext.from_hex_string(f"3x^2 + {i+1:X}")) for i in range(B)]
    a, b = batch_ciphertexts(cts_a), batch_ciphertexts(cts_b)

    def pipeline(x, y):
        return ev.relinearize(ev.multiply(x, y), rk)

    # eager per-ciphertext execution IS the unsharded single-chip path;
    # it shares no executable with the sharded jit below
    seq = [pipeline(x, y) for x, y in zip(cts_a, cts_b)]

    # 2x2 proves the dp x tp property; a wider mesh only adds SPMD
    # partitions to an already-covered compile (was dp=4: +2.5 min wall)
    hm = HEMesh(dp=2, tp=2)
    with hm:
        a_s = shard_ciphertext(a, hm, batched=True)
        b_s = shard_ciphertext(b, hm, batched=True)
        fn = vmap_pipeline(pipeline, hm)
        sharded = fn(a_s, b_s)
        jax.block_until_ready(sharded.data)

    for s, o in zip(seq, unbatch_ciphertexts(sharded)):
        assert np.array_equal(s.to_numpy(), o.to_numpy())
    # decrypt a couple to confirm semantics
    outs = unbatch_ciphertexts(sharded)
    got = dec.decrypt(outs[1]).to_hex_string()
    # (3) * (3x^2 + 2) = 9x^2 + 6
    assert got == "9x^2 + 6"


def test_tp_only_mesh_ntt_ops(bfv):
    """Tower-parallel elementwise path: NTT transform sharded over tp."""
    ev, enc = bfv["ev"], bfv["enc"]
    ct = enc.encrypt(Plaintext.from_hex_string("5x^3 + 2"))
    ref = ev.transform_to_ntt(ct).to_numpy()
    hm = HEMesh(dp=1, tp=2)
    with hm:
        ct_s = shard_ciphertext(ct, hm, batched=False)
        fn = jax.jit(lambda c: ev.transform_to_ntt(c),
                     in_shardings=hm.sharding(False),
                     out_shardings=hm.sharding(False))
        out = fn(ct_s)
        jax.block_until_ready(out.data)
    assert np.array_equal(out.to_numpy(), ref)


# ---------------------------------------------------------------------------
# Four-step coefficient-sharded NTT (sequence-parallel axis)
# ---------------------------------------------------------------------------

class TestFourStepNTT:
    @pytest.fixture(scope="class")
    def setup(self):
        from jax.sharding import Mesh
        from seal_tpu.modulus import CoeffModulus as CM
        from seal_tpu.ops import limb
        from seal_tpu.ops import ntt as ntt_mod
        from seal_tpu.parallel import fourstep

        log_n = 8  # n=256, P=8 -> M=32 local
        n = 1 << log_n
        moduli = [m.value for m in CM.create(n, [40, 41, 42])]
        t_ref = ntt_mod.build_device_tables(log_n, moduli)
        devs = np.asarray(jax.devices()[:8])
        mesh = Mesh(devs, ("sp",))
        t4 = fourstep.build_fourstep_tables(log_n, moduli, num_shards=8)
        rng = np.random.default_rng(7)
        vals = [[int(rng.integers(0, q)) for _ in range(n)] for q in moduli]
        x = limb.arr_to_u64(vals, shape=(len(moduli), n))
        return dict(log_n=log_n, moduli=moduli, t_ref=t_ref, mesh=mesh,
                    t4=t4, x=x, limb=limb, ntt_mod=ntt_mod, fourstep=fourstep)

    def _assert_eq(self, a, b):
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))

    @pytest.mark.parametrize("comm", ["a2a", "gather"])
    def test_forward_matches_single_chip(self, setup, comm):
        s = setup
        ref = s["ntt_mod"].ntt_forward(s["x"], s["t_ref"])
        got = s["fourstep"].ntt_forward_sharded(
            s["x"], s["t4"], s["mesh"], comm=comm)
        self._assert_eq(got, ref)

    @pytest.mark.parametrize("comm", ["a2a", "gather"])
    def test_inverse_matches_single_chip(self, setup, comm):
        s = setup
        fwd = s["ntt_mod"].ntt_forward(s["x"], s["t_ref"])
        ref = s["ntt_mod"].ntt_inverse(fwd, s["t_ref"])
        got = s["fourstep"].ntt_inverse_sharded(
            fwd, s["t4"], s["mesh"], comm=comm)
        self._assert_eq(got, ref)
        # and the roundtrip returns the input exactly
        self._assert_eq(got, s["x"])

    def test_a2a_route_collective_census(self, setup):
        """The default route must communicate via two tiled all_to_alls
        (O(n/P) bytes per shard), not the O(n) all_gather (VERDICT r2
        item 5); the gather route stays available and all_to_all-free."""
        s = setup
        fourstep = s["fourstep"]

        def census(comm, inverse):
            local = {("a2a", False): fourstep._fwd_local_a2a,
                     ("a2a", True): fourstep._inv_local_a2a,
                     ("gather", False): fourstep._fwd_local,
                     ("gather", True): fourstep._inv_local}[(comm, inverse)]
            import functools
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            x_spec = P(None, "sp")
            t4 = s["t4"]
            fn = shard_map(
                functools.partial(local, axis="sp"),
                mesh=s["mesh"],
                in_specs=(x_spec, x_spec,
                          fourstep._table_specs("sp", t4.log_n, t4.shards)),
                out_specs=(x_spec, x_spec))
            jaxpr = str(jax.make_jaxpr(fn)(s["x"][0], s["x"][1], t4))
            return jaxpr.count("all_to_all"), jaxpr.count("all_gather")

        a2a_f = census("a2a", False)
        a2a_i = census("a2a", True)
        g_f = census("gather", False)
        assert a2a_f[0] >= 2 and a2a_f[1] == 0, a2a_f
        assert a2a_i[0] >= 2 and a2a_i[1] == 0, a2a_i
        assert g_f[0] == 0 and g_f[1] >= 1, g_f

    def test_shard_count_4(self, setup):
        from jax.sharding import Mesh
        from seal_tpu.parallel import fourstep

        s = setup
        mesh4 = Mesh(np.asarray(jax.devices()[:4]), ("sp",))
        t4 = fourstep.build_fourstep_tables(s["log_n"], s["moduli"], num_shards=4)
        ref = s["ntt_mod"].ntt_forward(s["x"], s["t_ref"])
        got = fourstep.ntt_forward_sharded(s["x"], t4, mesh4)
        self._assert_eq(got, ref)


class TestPipelineParallel:
    def test_pipeline_matches_sequential(self):
        from jax.sharding import Mesh
        from seal_tpu.modulus import CoeffModulus as CM
        from seal_tpu.ops import limb, modring
        from seal_tpu.parallel import pipeline

        moduli = [m.value for m in CM.create(256, [40, 41])]
        mc = modring.make_mod_consts(moduli)
        rng = np.random.default_rng(5)
        M, n = 6, 256
        xs = limb.arr_to_u64(
            [[[int(rng.integers(0, q)) for _ in range(n)] for q in moduli]
             for _ in range(M)], shape=(M, len(moduli), n))

        def stage(c):
            def f(x):
                op, qt = modring.shoup_pair(
                    [[c % q] for q in moduli], [[q] for q in moduli],
                    shape=(len(moduli), 1))
                return limb.mul_mod_shoup(x, op, qt, mc.q)
            return f

        fns = [stage(c) for c in (3, 5, 7, 11)]
        mesh = Mesh(np.asarray(jax.devices()[:4]), ("pp",))
        got = pipeline.pipeline_apply(fns, xs, mesh)
        for m in range(M):
            want = (xs[0][m], xs[1][m])
            for f in fns:
                want = f(want)
            np.testing.assert_array_equal(np.asarray(got[0][m]), np.asarray(want[0]))
            np.testing.assert_array_equal(np.asarray(got[1][m]), np.asarray(want[1]))

    def test_interleave_microbatches(self):
        from seal_tpu.parallel import pipeline

        fns = [lambda x: x + 1, lambda x: x * 2]
        mbs = [np.uint32(1), np.uint32(5)]
        outs = pipeline.interleave_microbatches(fns, mbs)
        assert [int(o) for o in outs] == [4, 12]


class TestPipelineRealStages:
    """PP over REAL Evaluator stages (VERDICT r1 item 8): a ciphertext
    microbatch streams through multiply+relinearize -> rescale closures on a
    2-device pp mesh with the feed SHARDED over the axis (per-device memory
    O(M/P + P)); output is bit-identical to the sequential composition."""

    def test_ckks_mult_relin_rescale_pipeline(self):
        import jax.numpy as jnp
        from jax.sharding import Mesh
        from seal_tpu.ckks import CKKSEncoder
        from seal_tpu.dtypes import Ciphertext, RelinKeys
        from seal_tpu.parallel import pipeline

        parms = EncryptionParameters(SchemeType.CKKS)
        parms.set_poly_modulus_degree(64)
        parms.set_coeff_modulus(CoeffModulus.create(64, [40, 40, 40]))
        parms.set_random_seed((5, 6, 7, 8, 1, 2, 3, 4))
        ctx = SEALContext(parms, sec_level=SecLevelType.NONE)
        kg = KeyGenerator(ctx)
        pk = kg.create_public_key()
        rk = kg.create_relin_keys()
        enc = Encryptor(ctx, pk)
        ev = Evaluator(ctx)
        encoder = CKKSEncoder(ctx)
        scale = 2.0 ** 25
        L = ctx.first_context_data().coeff_modulus_size
        n = 64
        proto = None

        def payload(ca, cb):
            # [4, L, n]: rows (a0, a1, b0, b1)
            lo = jnp.concatenate([ca.data[0], cb.data[0]], axis=0)
            hi = jnp.concatenate([ca.data[1], cb.data[1]], axis=0)
            return (lo, hi)

        M = 2  # one chunk: keeps the unrolled graph small on the 1-core box
        rng = np.random.default_rng(0)
        pairs = []
        for m in range(M):
            vals = rng.uniform(-1, 1, encoder.slot_count)
            ca = enc.encrypt(encoder.encode(vals, scale))
            cb = enc.encrypt(encoder.encode(vals[::-1].copy(), scale))
            proto = ca
            pairs.append(payload(ca, cb))
        xs = (jnp.stack([p[0] for p in pairs]), jnp.stack([p[1] for p in pairs]))

        def wrap(pair, rows, Lr):
            c = proto.copy()
            c.data = (pair[0][rows[0]:rows[1], :Lr], pair[1][rows[0]:rows[1], :Lr])
            return c

        def stage_mult_relin(pair):
            a = wrap(pair, (0, 2), L)
            b = wrap(pair, (2, 4), L)
            out = ev.relinearize(ev.multiply(a, b), rk)
            z = jnp.zeros_like(out.data[0])
            return (jnp.concatenate([out.data[0], z], axis=0),
                    jnp.concatenate([out.data[1], z], axis=0))

        def stage_rescale(pair):
            c = wrap(pair, (0, 2), L)
            c.scale = scale * scale
            out = ev.rescale_to_next(c)
            zcol = jnp.zeros((2, 1, n), jnp.uint32)
            lo = jnp.concatenate([out.data[0], zcol], axis=1)
            hi = jnp.concatenate([out.data[1], zcol], axis=1)
            z = jnp.zeros_like(lo)
            return (jnp.concatenate([lo, z], axis=0),
                    jnp.concatenate([hi, z], axis=0))

        mesh = Mesh(np.asarray(jax.devices()[:2]), ("pp",))
        got = pipeline.pipeline_apply_sharded(
            [stage_mult_relin, stage_rescale], xs, mesh)

        for m in range(M):
            want = stage_rescale(stage_mult_relin((xs[0][m], xs[1][m])))
            assert np.array_equal(np.asarray(got[0][m]), np.asarray(want[0])), m
            assert np.array_equal(np.asarray(got[1][m]), np.asarray(want[1])), m


def test_fourstep_local_single_chip_bit_exact():
    """Single-chip four-step route (VERDICT r3 item 6 — the huge-n
    alternative where the monolithic Pallas kernel exceeds VMEM): shard
    axis as a batch axis, no collectives, bit-identical to ops/ntt.py."""
    import numpy as np

    from seal_tpu.modulus import CoeffModulus
    from seal_tpu.ops import limb
    from seal_tpu.ops import ntt as ntt_mod
    from seal_tpu.parallel import fourstep

    log_n = 10
    n = 1 << log_n
    moduli = [int(m) for m in CoeffModulus.create(n, [50, 40])]
    rng = np.random.default_rng(3)
    x = limb.arr_to_u64(
        [[int(v) for v in rng.integers(0, q, size=n)] for q in moduli],
        shape=(2, n))
    ref = ntt_mod.ntt_forward(x, ntt_mod.build_device_tables(log_n, moduli))
    for P_ in (2, 4):
        t4 = fourstep.build_fourstep_tables(log_n, moduli, P_)
        got = fourstep.ntt_forward_local(x, t4)
        assert np.array_equal(np.asarray(got[0]), np.asarray(ref[0]))
        assert np.array_equal(np.asarray(got[1]), np.asarray(ref[1]))
        back = fourstep.ntt_inverse_local(got, t4)
        assert np.array_equal(np.asarray(back[0]), np.asarray(x[0]))
        assert np.array_equal(np.asarray(back[1]), np.asarray(x[1]))
