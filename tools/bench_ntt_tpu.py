"""TPU microbench: Pallas fused NTT (expanded + compact tables) vs the XLA
stage-by-stage NTT, with the honest chained-differential methodology
(BASELINE.md r2 — `jax.block_until_ready` does not wait on the tunneled
backend; only a host transfer does).

Run on the real TPU: python tools/bench_ntt_tpu.py [--n 16384]
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--L", type=int, default=8)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--no-pair-compact", action="store_true",
                    help="A/B: force the roll+select butterfly formulation")
    ap.add_argument("--no-lane-t", action="store_true",
                    help="A/B: disable the transposed lane-stage compaction")
    ap.add_argument("--skip-compact", action="store_true",
                    help="skip the compact-table kernel rows")
    ap.add_argument("--fourstep", type=int, default=0,
                    help="also bench the SINGLE-CHIP four-step route with "
                         "this many sub-blocks (huge-n alternative where "
                         "the monolithic Pallas kernel exceeds VMEM)")
    ap.add_argument("--skip-pallas", action="store_true",
                    help="skip the Pallas kernels entirely (n=131072: no "
                         "VMEM-feasible monolithic kernel)")
    args = ap.parse_args()

    import jax

    from seal_tpu.modulus import CoeffModulus
    from seal_tpu.ops import ntt as ntt_mod
    from seal_tpu.ops import ntt_pallas as npk
    from seal_tpu.dtypes import to_device

    if args.no_pair_compact:
        npk._PAIR_COMPACT_SUBLANE = False
        npk._PAIR_COMPACT_LANE = False
        npk._PAIR_COMPACT_LANE_T = False
    if args.no_lane_t:
        npk._PAIR_COMPACT_LANE_T = False

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    n, L, batch = args.n, args.L, args.batch
    log_n = n.bit_length() - 1

    with jax.default_device(cpu):
        qs = [int(m) for m in CoeffModulus.create(n, [50] * L)]
        t = ntt_mod.build_device_tables(log_n, qs)
        pt = ct = None
        if not args.skip_pallas:
            pt = npk.build_pallas_tables(log_n, qs)
            ct = npk.build_pallas_tables_compact(log_n, qs)
        t4 = None
        if args.fourstep:
            from seal_tpu.parallel import fourstep
            t4 = fourstep.build_fourstep_tables(log_n, qs, args.fourstep)
        rng = np.random.default_rng(0)
        x_host = np.stack(
            [rng.integers(0, q, size=(batch, n), dtype=np.uint64) for q in qs], axis=1
        )
        x = to_device(x_host)
        ref = ntt_mod.ntt_forward(x, t)
        ref_np = (np.asarray(ref[0]), np.asarray(ref[1]))

    x = jax.device_put(x, tpu)
    t = jax.device_put(t, tpu)
    if pt is not None:
        pt = jax.device_put(pt, tpu)
        ct = jax.device_put(ct, tpu)
    if t4 is not None:
        t4 = jax.device_put(t4, tpu)

    from jax import tree_util

    def hoisted(f, *ex):
        """jit(f) with every closed-over array (the multi-MB expanded root
        tables) hoisted to device-resident jaxpr consts — the remote
        compile endpoint rejects payloads above ~100 MB, which the tables
        pass at n=65536 (same trick as bench_ops_tpu._marginal)."""
        jpr, out_shape = jax.make_jaxpr(f, return_shape=True)(*ex)
        out_tree = tree_util.tree_structure(out_shape)
        consts = [jax.device_put(c) for c in jpr.consts]

        @jax.jit
        def conv(consts_, *ex_):
            out = jax.core.eval_jaxpr(
                jpr.jaxpr, consts_, *tree_util.tree_leaves(ex_))
            return tree_util.tree_unflatten(out_tree, out)

        return lambda *ex_: conv(consts, *ex_)

    # correctness of the compiled kernels on real hardware (fwd and inv)
    kinds = [] if args.skip_pallas else (
        [("expanded", pt)] + ([] if args.skip_compact else [("compact", ct)]))
    for name, tables in kinds:
        got = hoisted(lambda v, tb=tables: npk.ntt_forward_pallas(v, tb), x)(x)
        ok = np.array_equal(np.asarray(got[0]), ref_np[0]) and np.array_equal(
            np.asarray(got[1]), ref_np[1])
        print(f"pallas fwd ({name}) matches XLA on TPU: {ok}", flush=True)
        rt = hoisted(lambda v, tb=tables: npk.ntt_inverse_pallas(
            npk.ntt_forward_pallas(v, tb), tb), x)(x)
        ok = np.array_equal(np.asarray(rt[0]), np.asarray(x[0])) and             np.array_equal(np.asarray(rt[1]), np.asarray(x[1]))
        print(f"pallas fwd+inv roundtrip ({name}) exact on TPU: {ok}",
              flush=True)

    def measure(step, label):
        fn = hoisted(lambda v, s: jax.lax.fori_loop(
            0, s, lambda i, a: step(a), v), x, 1)
        o = fn(x, 1)
        _ = np.asarray(o[0][0, 0, :2])  # forced transfer: the only real sync

        def run(s):
            t0 = time.perf_counter()
            o = fn(x, s)
            _ = np.asarray(o[0][0, 0, :2])
            return time.perf_counter() - t0

        # min each chain length separately, then subtract (min-of-differences
        # picks the most-negative noise sample); 256-step differential keeps
        # the signal well above the tunnel's multi-ms jitter
        run(4)
        ts = min(run(8) for _ in range(4))
        tl = min(run(264) for _ in range(4))
        d = (tl - ts) / 256 / (batch * L)
        print(f"{label}: {d*1e6:.2f} us per {n}-pt transform "
              f"({batch*L/d:.0f} NTT/s marginal)")

    if t4 is not None:
        from seal_tpu.parallel import fourstep
        vfwd = lambda a: jax.vmap(
            lambda pair: fourstep.ntt_forward_local(pair, t4))(a)
        got = hoisted(vfwd, x)(x)
        ok = np.array_equal(np.asarray(got[0]), ref_np[0]) and \
            np.array_equal(np.asarray(got[1]), ref_np[1])
        print(f"four-step local (P={args.fourstep}) fwd matches XLA on TPU: "
              f"{ok}", flush=True)

    measure(lambda a: ntt_mod.ntt_forward(a, t), "XLA stage-by-stage")
    if not args.skip_pallas:
        measure(lambda a: npk.ntt_forward_pallas(a, pt), "Pallas expanded  ")
        if not args.skip_compact:
            measure(lambda a: npk.ntt_forward_pallas(a, ct), "Pallas compact   ")
    if t4 is not None:
        measure(vfwd, f"four-step local P={args.fourstep}")


if __name__ == "__main__":
    main()
