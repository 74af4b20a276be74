"""Multi-chip / multi-host scaling benchmark (BASELINE.json config #5):
a batch of CKKS multiply+relinearize+rescale pipelines sharded dp x tp over
every visible device, reporting per-chip throughput and scaling efficiency
vs a single-device run of the same program.

Usage:
  single host (all local chips):   python tools/bench_multihost.py
  multi-host (run on every host):  python tools/bench_multihost.py \
      --coordinator <host0>:8476 --num-processes N --process-id <i>
  CPU functional demo:             JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/bench_multihost.py --n 1024 --L 3 --batch 16

Design (SURVEY.md §2.11): ciphertext batch on 'dp', RNS tower on 'tp';
keys replicated; XLA inserts the psum/all-gather collectives over ICI/DCN.
The sandbox exposes one TPU chip, so the TPU scaling legs must run on a
real pod slice; the harness itself is exercised on the virtual CPU mesh in
tests/test_parallel.py.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--L", type=int, default=8)
    ap.add_argument("--batch", type=int, default=32, help="global batch")
    ap.add_argument("--tp", type=int, default=1, help="tower-parallel width")
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--coordinator", type=str, default=None)
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    args = ap.parse_args()

    import os

    import jax

    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        # this sandbox's sitecustomize hard-sets the axon backend; the env
        # var alone does not select CPU (CLAUDE.md gotcha)
        jax.config.update("jax_platforms", "cpu")

    if args.coordinator:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from seal_tpu import (
        CoeffModulus, EncryptionParameters, Encryptor, Evaluator,
        KeyGenerator, SEALContext, SecLevelType,
    )
    from seal_tpu.encryption_params import SchemeType
    from seal_tpu.ckks import CKKSEncoder

    devices = jax.devices()
    n_dev = len(devices)
    tp = args.tp
    dp = n_dev // tp
    if dp * tp != n_dev:
        raise SystemExit(f"tp={tp} does not divide device count {n_dev}")
    B = args.batch - args.batch % max(dp, 1) or dp

    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = devices[0]

    n = args.n
    sec = SecLevelType.TC128 if n >= 4096 else SecLevelType.NONE
    parms = EncryptionParameters(SchemeType.CKKS)
    parms.set_poly_modulus_degree(n)
    parms.set_coeff_modulus(CoeffModulus.create(n, [48] * args.L + [54]))
    parms.set_random_seed((1, 2, 3, 4, 5, 6, 7, 8))

    with jax.default_device(cpu):
        ctx = SEALContext(parms, sec_level=sec)
        kg = KeyGenerator(ctx)
        pk = kg.create_public_key()
        rk = kg.create_relin_keys()
        enc = Encryptor(ctx, pk)
        ev = Evaluator(ctx)
        encoder = CKKSEncoder(ctx)
        vals = np.linspace(-1, 1, encoder.slot_count)
        ct1 = enc.encrypt(encoder.encode(vals, 2.0 ** 40))
        ct2 = enc.encrypt(encoder.encode(vals[::-1], 2.0 ** 40))

    mesh = Mesh(np.asarray(devices).reshape(dp, tp), ("dp", "tp"))
    ct_spec = NamedSharding(mesh, P("dp", None, "tp", None))   # [B, size, L, N]
    key_spec = NamedSharding(mesh, P())                         # replicated

    def expand(ct):
        return tuple(
            jax.device_put(jnp.broadcast_to(d, (B,) + d.shape), ct_spec)
            for d in ct.data)

    a_data = expand(ct1)
    b_data = expand(ct2)
    rk.keys = [
        jax.device_put(k, key_spec) if k is not None else None for k in rk.keys
    ]

    def one(x_pair, y_pair):
        ca = ct1.copy(); ca.data = x_pair
        cb = ct2.copy(); cb.data = y_pair
        return ev.rescale_to_next(ev.relinearize(ev.multiply(ca, cb), rk)).data

    def timed(fn, xa, xb):
        # force completion with a host transfer of one local shard —
        # `block_until_ready` does not wait on tunneled backends (BASELINE
        # r2); device program order makes the last transfer cover all reps
        def sync(o):
            leaf = jax.tree.leaves(o)[0]
            _ = np.asarray(leaf.addressable_data(0)).reshape(-1)[:1]

        out = fn(xa, xb)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fn(xa, xb)
        sync(out)
        return (time.perf_counter() - t0) / args.reps

    with mesh:
        # output sharding left to XLA: the rescaled tower has L-1 rows,
        # which need not stay divisible by tp
        fn = jax.jit(lambda x, y: jax.vmap(one)(x, y),
                     in_shardings=(ct_spec, ct_spec))
        dt = timed(fn, a_data, b_data)

    sharded_cts_per_s = B / dt

    # single-device comparator: same per-device batch on device 0
    b1 = max(B // n_dev, 1)
    with jax.default_device(devices[0]):
        a1 = tuple(jax.device_put(d[:b1], devices[0]) for d in a_data)
        b1d = tuple(jax.device_put(d[:b1], devices[0]) for d in b_data)
        rk.keys = [jax.device_put(k, devices[0]) if k is not None else None
                   for k in rk.keys]
        fn1 = jax.jit(lambda x, y: jax.vmap(one)(x, y))
        dt1 = timed(fn1, a1, b1d)
    single_cts_per_s = b1 / dt1

    eff = sharded_cts_per_s / (single_cts_per_s * n_dev)
    print(json.dumps({
        "metric": f"ckks_n{n}_L{args.L}_pipeline_scaling ({devices[0].platform})",
        "devices": n_dev, "dp": dp, "tp": tp, "global_batch": B,
        "sharded_cts_per_s": round(sharded_cts_per_s, 2),
        "single_device_cts_per_s": round(single_cts_per_s, 2),
        "scaling_efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
