"""Sustained streaming throughput — BASELINE config #5's shape on one chip.

The headline bench (bench.py) reports a chained fori_loop MARGINAL: pure
device throughput with dispatch amortized away. A production pipeline
(config #5: a 4096-ciphertext batched stream) instead pays per-chunk
dispatch, host feed, and result drain. This bench measures that: stream
`--total` ciphertexts through mult + relinearize(+rescale) in B-sized
chunks as INDEPENDENT dispatches and report wall-clock ops/s from first
feed to final drain (VERDICT r3 item 3).

Modes:
  default        device-resident stream: W rotating pre-uploaded input
                 buffers, one jitted step per chunk, one combined drain op
                 (a device-side probe stack fetched once — the only reliable
                 completion signal on this tunneled backend).
  --feed         each chunk's inputs are device_put from host inside the
                 timed loop (adds host->device feed; NOTE: this sandbox
                 reaches the TPU over a tunnel, so feed bandwidth here is
                 tunnel-limited — the measured upload MB/s is printed so the
                 PCIe-rate number can be projected).
  --sweep        B in {8, 16, 24, 32}: sustained ops/s per B plus XLA
                 memory_analysis per executable (the B>16 saturation-curve
                 decline, BASELINE.md).

Usage: python tools/bench_sustained.py [--total 1024] [--B 16] [--parity]
       [--no-fused] [--feed] [--sweep] [--submap 16]

--submap S splits each B-chunk into B//S sequential vmap sub-batches
inside ONE dispatch (lax.map): per-sub-batch temps stay at the B=16
sweet spot while dispatch count drops — B=64 --submap 16 sustained
1115.0 ops/s at 4096 cts (flat B=16: 1062.4), the production recipe.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import REFERENCE_OPS_PER_S, _backend_up  # repo-root bench.py



def _enable_compile_cache():
    """Persistent XLA compile cache (tunnel compiles cost minutes; repeat
    runs should hit disk — same setup as tests/conftest.py)."""
    import os

    import jax

    os.makedirs("/root/.cache/jax", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def _setup(alpha: int, fused: bool):
    import jax

    _enable_compile_cache()

    from seal_tpu import (
        CoeffModulus, EncryptionParameters, Encryptor, Evaluator,
        KeyGenerator, SEALContext,
    )
    from seal_tpu.encryption_params import SchemeType
    from seal_tpu.ckks import CKKSEncoder

    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = jax.devices()[0]
    target = jax.devices()[0]

    n = 16384
    if alpha == 1:
        bits = [48] * 8 + [54]
    else:
        bits = [44] * 8 + [86 // alpha] * alpha
    parms = EncryptionParameters(SchemeType.CKKS)
    parms.set_poly_modulus_degree(n)
    parms.set_coeff_modulus(CoeffModulus.create(n, bits))
    parms.set_special_modulus_size(alpha)
    parms.set_random_seed((1, 2, 3, 4, 5, 6, 7, 8))

    with jax.default_device(cpu):
        ctx = SEALContext(parms)
        kg = KeyGenerator(ctx)
        pk = kg.create_public_key()
        rk = kg.create_relin_keys()
        enc = Encryptor(ctx, pk)
        ev = Evaluator(ctx)
        encoder = CKKSEncoder(ctx)
        scale = 2.0 ** 40
        vals = np.linspace(-1, 1, encoder.slot_count)
        ct1 = enc.encrypt(encoder.encode(vals, scale))
        ct2 = enc.encrypt(encoder.encode(vals[::-1], scale))
    rk.keys = [jax.device_put(k, target) if k is not None else None
               for k in rk.keys]

    def one(x_pair, y_pair):
        ca = ct1.copy(); ca.data = x_pair
        cb = ct2.copy(); cb.data = y_pair
        if fused:
            return ev.relinearize_rescale(ev.multiply(ca, cb), rk).data
        return ev.rescale_to_next(ev.relinearize(ev.multiply(ca, cb), rk)).data

    return dict(ct1=ct1, ct2=ct2, one=one, target=target)


def _chunk(su, B, seed_shift):
    """B-batched host input arrays (u32 pairs), cheaply varied per chunk."""
    d = su["ct1"].data
    lo = np.asarray(d[0])
    hi = np.asarray(d[1])
    lo = np.broadcast_to(lo, (B,) + lo.shape).copy()
    # vary one limb plane so chunks aren't bit-identical uploads
    lo[..., 0] ^= np.uint32(seed_shift & 0x7FFF)
    hi = np.broadcast_to(hi, (B,) + hi.shape)
    return lo, np.ascontiguousarray(hi)


def run_stream(su, total: int, B: int, feed: bool, submap: int = 0):
    """submap > 0: split each B-chunk into B//submap sequential sub-batches
    of `submap` inside ONE dispatch (lax.map over vmap) — per-sub-batch
    temp footprint (the B>16 decline driver) at 1/(B//submap) of the flat
    vmap's, while halving/quartering the per-chunk dispatch count."""
    import jax
    import jax.numpy as jnp

    target = su["target"]
    chunks = total // B
    if submap and submap < B:
        assert B % submap == 0
        inner = jax.vmap(su["one"])

        def stepped(x_pair, y_pair):
            g = B // submap
            xr = tuple(a.reshape((g, submap) + a.shape[1:]) for a in x_pair)
            yr = tuple(a.reshape((g, submap) + a.shape[1:]) for a in y_pair)
            lo, hi = jax.lax.map(lambda xy: inner(xy[0], xy[1]), (xr, yr))
            return (lo.reshape((B,) + lo.shape[2:]),
                    hi.reshape((B,) + hi.shape[2:]))

        fn = jax.jit(stepped)
    else:
        fn = jax.jit(jax.vmap(su["one"]))

    d2 = jax.device_put(
        tuple(jnp.broadcast_to(d, (B,) + d.shape) for d in su["ct2"].data),
        target)

    W = 4
    bufs = []
    for w in range(W):
        lo, hi = _chunk(su, B, w)
        bufs.append(jax.device_put((jnp.asarray(lo), jnp.asarray(hi)), target))

    # warm-up: compile + one completed execution (host transfer = the only
    # reliable completion wait on this backend)
    out = fn(bufs[0], d2)
    _ = np.asarray(out[0][0, 0, 0, :2])

    fed_bytes = 0
    t0 = time.perf_counter()
    outs = []
    if feed:
        # prefetch-depth pipeline: keep `prefetch` chunk uploads in flight
        # ahead of the dispatches so host->device transfer overlaps device
        # compute (device_put is asynchronous; depth 0 = the legacy
        # upload-then-dispatch interleave)
        from collections import deque

        prefetch = int(os.environ.get("SEALTPU_FEED_PREFETCH", "0"))
        pending: deque = deque()
        for c in range(chunks):
            lo, hi = _chunk(su, B, c)
            fed_bytes += lo.nbytes + hi.nbytes
            pending.append(jax.device_put(
                (jnp.asarray(lo), jnp.asarray(hi)), target))
            while len(pending) > prefetch:
                outs.append(fn(pending.popleft(), d2))
        while pending:
            outs.append(fn(pending.popleft(), d2))
    else:
        for c in range(chunks):
            outs.append(fn(bufs[c % W], d2))
    # drain: ONE device-side op over every chunk's output, fetched once —
    # forces completion of the whole stream with a single host transfer
    probe = jnp.stack([o[0][0, 0, 0, 0] for o in outs])
    _ = np.asarray(probe)
    wall = time.perf_counter() - t0
    return dict(ops_per_s=chunks * B / wall, wall_s=wall,
                fed_mb=fed_bytes / 1e6,
                feed_mbps=(fed_bytes / 1e6 / wall) if feed else None)


def memory_analysis(su, B):
    import jax

    fn = jax.jit(jax.vmap(su["one"]))
    import jax.numpy as jnp
    d1 = tuple(jnp.broadcast_to(d, (B,) + d.shape) for d in su["ct1"].data)
    d2 = tuple(jnp.broadcast_to(d, (B,) + d.shape) for d in su["ct2"].data)
    try:
        m = fn.lower(d1, d2).compile().memory_analysis()
        return dict(
            args_mb=round(m.argument_size_in_bytes / 1e6, 1),
            out_mb=round(m.output_size_in_bytes / 1e6, 1),
            temp_mb=round(m.temp_size_in_bytes / 1e6, 1),
            total_mb=round((m.argument_size_in_bytes + m.output_size_in_bytes
                            + m.temp_size_in_bytes) / 1e6, 1),
        )
    except Exception as e:  # noqa: BLE001 — backend may not expose it
        return dict(error=str(e)[:120])


def main():
    args = sys.argv[1:]
    total = int(args[args.index("--total") + 1]) if "--total" in args else 1024
    B = int(args[args.index("--B") + 1]) if "--B" in args else 16
    alpha = 1 if "--parity" in args else 2
    fused = "--no-fused" not in args
    if not _backend_up():
        print(json.dumps({"error": "TPU tunnel unreachable"}))
        return

    su = _setup(alpha, fused)
    mode = (f"hybrid{alpha}" if alpha > 1 else "parity") + \
        ("_fused" if fused else "")

    if "--sweep" in args:
        for b, sm in ((8, 0), (16, 0), (24, 0), (32, 0),
                      (32, 16), (64, 16), (128, 16)):
            r = run_stream(su, total, b, feed=False, submap=sm)
            mem = memory_analysis(su, b) if not sm else {"submap": sm}
            print(json.dumps({
                "metric": f"sustained_stream_{mode}"
                          + (f"_submap{sm}" if sm else ""),
                "B": b, "total_cts": total,
                "value": round(r["ops_per_s"], 1),
                "unit": "ops/s/chip", "wall_s": round(r["wall_s"], 3),
                "memory": mem,
            }), flush=True)
        return

    if "--overlap-analysis" in args:
        # compute-under-transfer isolation (VERDICT r4 weak #7): measure
        # the three legs separately so the feed number decomposes —
        #   T_comp:  device-resident stream (no feed)
        #   T_up:    uploads only (device_put every chunk, then force
        #            completion with one fetch per buffer probe)
        #   T_feed:  pipelined feed at prefetch depths {0, 2, 4}
        # overlap efficiency = max(T_up, T_comp) / T_feed (1.0 = perfect
        # compute/transfer overlap; the sum-bound floor is
        # (T_up + T_comp) / T_feed <= 1).
        import jax
        import jax.numpy as jnp

        target = su["target"]
        chunks = total // B
        rc = run_stream(su, total, B, feed=False)
        t_comp = rc["wall_s"]
        t0 = time.perf_counter()
        ups = []
        for c in range(chunks):
            lo, hi = _chunk(su, B, c)
            ups.append(jax.device_put(
                (jnp.asarray(lo), jnp.asarray(hi)), target))
        probe = jnp.stack([u[0][0, 0, 0, 0] for u in ups])
        _ = np.asarray(probe)
        t_up = time.perf_counter() - t0
        rows = {"B": B, "total_cts": total,
                "t_comp_s": round(t_comp, 3), "t_up_s": round(t_up, 3)}
        for depth in (0, 2, 4):
            os.environ["SEALTPU_FEED_PREFETCH"] = str(depth)
            r = run_stream(su, total, B, feed=True)
            rows[f"t_feed_d{depth}_s"] = round(r["wall_s"], 3)
            rows[f"overlap_eff_d{depth}"] = round(
                max(t_up, t_comp) / r["wall_s"], 3)
            rows[f"feed_mbps_d{depth}"] = round(r["feed_mbps"], 1)
        print(json.dumps({"metric": f"feed_overlap_{mode}", **rows}),
              flush=True)
        return

    submap = int(args[args.index("--submap") + 1]) if "--submap" in args else 0
    r = run_stream(su, total, B, feed="--feed" in args, submap=submap)
    out = {
        "metric": f"sustained_stream_{mode}"
                  + (f"_submap{submap}" if submap else "")
                  + ("_feed" if "--feed" in args else ""),
        "B": B, "total_cts": total,
        "value": round(r["ops_per_s"], 1), "unit": "ops/s/chip",
        "wall_s": round(r["wall_s"], 3),
        "vs_baseline": round(r["ops_per_s"] / REFERENCE_OPS_PER_S, 3),
    }
    if r["feed_mbps"] is not None:
        out["fed_mb"] = round(r["fed_mb"], 1)
        out["feed_mbps_tunnel"] = round(r["feed_mbps"], 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
