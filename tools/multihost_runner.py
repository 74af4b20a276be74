"""One simulated host of a multi-host seal_tpu run (SURVEY §5.8, §2.11).

Each invocation is one OS process = one "host": its own XLA CPU client with
`--xla_force_host_platform_device_count` local devices, joined into a global
mesh via `jax.distributed.initialize`, with cross-process collectives riding
the gloo transport — the sandbox's stand-in for DCN (on real pods the same
program text runs unchanged; XLA lowers the psum to ICI/DCN collectives).

What it validates, end to end and bit-exactly:
  1. TP leg — the REAL `tp_relinearize` keyswitch (parallel/keyswitch.py)
     with the decomposition axis sharded across processes, so its single
     exact psum of 21-bit limb splits crosses the process boundary; output
     is bit-compared against the local single-chip `Evaluator.relinearize`.
  2. DP leg — a ciphertext batch sharded over all global devices through a
     jitted dyadic multiply, gathered and bit-compared against the
     unsharded op.

Launch (2 hosts x 1 device):
    JAX_PLATFORMS=cpu python tools/multihost_runner.py --pid 0 --nprocs 2 --port 9955 &
    JAX_PLATFORMS=cpu python tools/multihost_runner.py --pid 1 --nprocs 2 --port 9955
or run `tests/test_multihost.py`, which spawns both and checks the output.
Add `XLA_FLAGS=--xla_force_host_platform_device_count=2` to each process for
the mixed topology (tp=4 spanning intra-process AND cross-process links —
the ICI+DCN shape of a real pod slice); validated bit-exact both ways.

Every quantity fed to the global mesh is deterministic integer math from a
fixed PRNG seed, so all processes hold identical host values — the documented
requirement for `TPKeySwitch`'s multi-process input placement.
"""

from __future__ import annotations

import argparse
import os
import sys

# hermetic import: running `python tools/multihost_runner.py` puts tools/ on
# sys.path, not the repo root, so a fresh clone without `pip install -e .`
# would fail to import seal_tpu — fall back to the repo root explicitly
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--pid", type=int, required=True)
    p.add_argument("--nprocs", type=int, required=True)
    p.add_argument("--port", type=int, required=True)
    p.add_argument("--legs", default="base", choices=["base", "r5", "all"],
                   help="base: TP/DP/SP legs; r5: hoisted rotation batch + "
                        "fused relinearize+rescale through the cross-process "
                        "TP path; all: both")
    args = p.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    # the sandbox sitecustomize pins jax_platforms="axon,cpu"; a multi-host
    # CPU simulation must never touch the tunnel
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{args.port}",
        num_processes=args.nprocs,
        process_id=args.pid,
    )

    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from seal_tpu import (
        CoeffModulus,
        EncryptionParameters,
        Evaluator,
        KeyGenerator,
        SEALContext,
        SchemeType,
        SecLevelType,
    )
    from seal_tpu.dtypes import Ciphertext, to_device
    from seal_tpu.ops import modring
    from seal_tpu.parallel.keyswitch import tp_relinearize

    devs = jax.devices()
    n_local = len(jax.local_devices())
    log = lambda msg: print(f"[host {args.pid}] {msg}", flush=True)
    log(f"up: {len(devs)} global devices, {n_local} local, "
        f"transport=gloo (DCN stand-in)")

    # deterministic context + keys: identical on every host by construction;
    # data-tower count = global device count so the TP decomposition splits
    # exactly over the whole mesh (tp=2 with 2x1, tp=4 with 2x2 local devices)
    SEED = (1, 2, 3, 4, 5, 6, 7, 8)
    if args.legs in ("r5", "all"):
        rc = _r5_legs(args, jax, devs, log, SEED)
        if rc:
            return rc
        if args.legs == "r5":
            log("ALL OK")
            return 0
    parms = EncryptionParameters(SchemeType.BFV)
    parms.set_poly_modulus_degree(64)
    parms.set_coeff_modulus(CoeffModulus.create(64, [40] * (len(devs) + 1)))
    parms.set_plain_modulus(257)
    parms.set_random_seed(SEED)
    ctx = SEALContext(parms, sec_level=SecLevelType.NONE)
    kg = KeyGenerator(ctx)
    rk = kg.create_relin_keys()
    ev = Evaluator(ctx)
    cd = ctx.first_context_data()
    moduli = cd.key_moduli()

    # --- TP leg: the real keyswitch, psum across the process boundary -------
    rng = np.random.default_rng(7)
    rows = np.stack([
        np.stack([rng.integers(0, q, size=64, dtype=np.uint64) for q in moduli])
        for _ in range(3)
    ])
    cm = Ciphertext(to_device(rows), parms_id=tuple(ctx.first_parms_id))
    ref = ev.relinearize(cm, rk)          # local single-chip reference
    mesh = Mesh(np.asarray(devs).reshape(1, len(devs)), ("dp", "tp"))
    got = tp_relinearize(ev, cm, rk, mesh)
    if not np.array_equal(ref.to_numpy(), got.to_numpy()):
        log("TP relinearize MISMATCH")
        return 1
    log(f"TP relinearize over tp={len(devs)} (psum across {args.nprocs} "
        f"processes): BITEXACT vs single-chip")

    # --- DP leg: batch axis sharded over every global device ----------------
    B = len(devs) * 2
    batch = np.stack([
        np.stack([rng.integers(0, q, size=64, dtype=np.uint64) for q in moduli])
        for _ in range(B)
    ])
    mc = cd.mod_consts

    def dyadic_sq(pair):
        return modring.dyadic_product(pair, pair, mc)

    want_lo, want_hi = jax.vmap(dyadic_sq)(to_device(batch))
    want = (np.asarray(want_lo), np.asarray(want_hi))

    sh = NamedSharding(Mesh(np.asarray(devs), ("dp",)), P("dp"))
    lo = (batch & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (batch >> np.uint64(32)).astype(np.uint32)
    glo = jax.make_array_from_callback(lo.shape, sh, lambda i: lo[i])
    ghi = jax.make_array_from_callback(hi.shape, sh, lambda i: hi[i])
    out = jax.jit(jax.vmap(dyadic_sq), out_shardings=(sh, sh))((glo, ghi))
    # each process holds B/nprocs of the output; compare its own slice
    mine = sorted(
        {s.index[0].start for s in out[0].addressable_shards})
    lo_slice = np.concatenate([np.asarray(s.data) for s in sorted(
        out[0].addressable_shards, key=lambda s: s.index[0].start)])
    hi_slice = np.concatenate([np.asarray(s.data) for s in sorted(
        out[1].addressable_shards, key=lambda s: s.index[0].start)])
    start = min(mine)
    stop = start + lo_slice.shape[0]
    if not (np.array_equal(lo_slice, want[0][start:stop])
            and np.array_equal(hi_slice, want[1][start:stop])):
        log("DP dyadic multiply MISMATCH")
        return 1
    log(f"DP dyadic batch B={B} sharded over {len(devs)} global devices: "
        f"BITEXACT (local slice rows {start}..{stop - 1})")

    # --- SP leg: four-step NTT, coefficient axis split across processes -----
    from jax.sharding import PartitionSpec
    from seal_tpu.ops import limb as limb_mod
    from seal_tpu.ops import ntt as ntt_mod
    from seal_tpu.parallel import fourstep

    log_n = 8
    n4 = 1 << log_n
    moduli4 = [m.value for m in CoeffModulus.create(n4, [40, 41])]
    t_ref = ntt_mod.build_device_tables(log_n, moduli4)
    t4 = fourstep.build_fourstep_tables(log_n, moduli4, num_shards=len(devs))
    vals = rng.integers(0, np.asarray(moduli4)[:, None],
                        size=(len(moduli4), n4)).astype(np.uint64)
    x = limb_mod.arr_to_u64([[int(v) for v in row] for row in vals],
                            shape=vals.shape)
    ref4 = ntt_mod.ntt_forward(x, t_ref)
    ref4 = (np.asarray(ref4[0]), np.asarray(ref4[1]))

    mesh_sp = Mesh(np.asarray(devs), ("sp",))

    def gput(a, spec):
        sh = NamedSharding(mesh_sp, spec)
        ah = np.asarray(a)
        return jax.make_array_from_callback(ah.shape, sh,
                                            lambda i, ah=ah: ah[i])

    specs = fourstep._table_specs("sp", log_n, len(devs))
    gt = t4._replace(**{
        f: jax.tree.map(lambda a, s=getattr(specs, f): gput(a, s),
                        getattr(t4, f))
        for f in t4._fields if isinstance(getattr(specs, f), PartitionSpec)
    })
    xg = tuple(gput(np.asarray(a), P(None, "sp")) for a in x)
    out4 = fourstep.ntt_forward_sharded(xg, gt, mesh_sp)
    # output is coefficient-sharded: each process checks its own columns
    for a, want in zip(out4, ref4):
        for s in a.addressable_shards:
            if not np.array_equal(np.asarray(s.data), want[s.index]):
                log("SP four-step NTT MISMATCH")
                return 1
    cols = sorted((s.index[1] for s in out4[0].addressable_shards),
                  key=lambda c: c.start)
    log(f"SP four-step NTT n={n4} over {len(devs)} shards across "
        f"{args.nprocs} processes: BITEXACT (local columns "
        + ", ".join(f"{c.start}..{c.stop - 1}" for c in cols) + ")")

    log("ALL OK")
    return 0


def _r5_legs(args, jax, devs, log, SEED) -> int:
    """r5 multihost legs (VERDICT r4 item 5): the hoisted rotation batch
    (one shared sharded decompose, ONE psum for the whole batch) and the
    fused relinearize+rescale tail, both through the CROSS-PROCESS TP
    keyswitch on the mixed intra-process + gloo topology, bit-compared
    against the single-chip Evaluator. Per-leg collective payloads (the
    exact psum byte counts crossing the transport) are logged."""
    import numpy as np
    from jax.sharding import Mesh

    from seal_tpu import (
        CoeffModulus,
        EncryptionParameters,
        Encryptor,
        Evaluator,
        KeyGenerator,
        SEALContext,
        SchemeType,
        SecLevelType,
    )
    from seal_tpu.ckks import CKKSEncoder
    from seal_tpu.parallel.keyswitch import TPEvaluator

    n = 64
    parms = EncryptionParameters(SchemeType.CKKS)
    parms.set_poly_modulus_degree(n)
    parms.set_coeff_modulus(CoeffModulus.create(n, [40] * (len(devs) + 1)))
    parms.set_random_seed(SEED)
    ctx = SEALContext(parms, sec_level=SecLevelType.NONE)
    kg = KeyGenerator(ctx)
    rk = kg.create_relin_keys()
    steps = [1, -1]
    gt = ctx.key_context_data().galois_tool
    gk = kg.create_galois_keys(gt.get_elts_from_steps(steps))
    enc = Encryptor(ctx, kg.create_public_key())
    ev = Evaluator(ctx)
    encoder = CKKSEncoder(ctx)
    scale = 2.0 ** 30
    vals = np.linspace(-1, 1, encoder.slot_count)
    c1 = enc.encrypt(encoder.encode(vals, scale))
    c2 = enc.encrypt(encoder.encode(vals + 0.5, scale))

    mesh = Mesh(np.asarray(devs).reshape(1, len(devs)), ("dp", "tp"))
    tpe = TPEvaluator(ctx, mesh)
    tks = tpe._tks_for(c1.parms_id)
    I = tks.L + tks.alpha

    # hoisted rotation batch across the process boundary
    ref_rots = ev.rotate_batch_hoisted(c1, steps, gk)
    got_rots = tpe.rotate_batch_hoisted(c1, steps, gk)
    for a, b in zip(ref_rots, got_rots):
        for x, y in zip(a.data, b.data):
            if not np.array_equal(np.asarray(x), np.asarray(y)):
                log("hoisted rotation batch MISMATCH")
                return 1
    if len(steps) not in tks._hoisted_fns:
        log("hoisted batch did not take the sharded path")
        return 1
    payload = len(steps) * 2 * 3 * I * n * 4
    log(f"hoisted {len(steps)}-rotation batch over tp={len(devs)} across "
        f"{args.nprocs} processes: BITEXACT vs single-chip "
        f"(ONE psum, {payload} B stacked limb splits)")

    # fused relinearize+rescale tail through the TP prod
    ref_f = ev.relinearize_rescale(ev.multiply(c1, c2), rk)
    got_f = tpe.relinearize_rescale(tpe.multiply(c1, c2), rk)
    for x, y in zip(ref_f.data, got_f.data):
        if not np.array_equal(np.asarray(x), np.asarray(y)):
            log("fused relinearize+rescale MISMATCH")
            return 1
    payload = 2 * 3 * I * n * 4
    log(f"fused relinearize+rescale over tp={len(devs)} across "
        f"{args.nprocs} processes: BITEXACT vs single-chip "
        f"(one psum, {payload} B)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
