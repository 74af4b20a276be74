"""Benchmark runner: prints ONE JSON line for the driver.

Headline metric (BASELINE.json): CKKS n=16384 L=8 ciphertext
multiply + relinearize + rescale throughput per chip. The whole pipeline is
one jitted function over a batch of ciphertexts; context constants are baked
into the executable.

Measurement methodology (hard-won, see memory/BASELINE notes):
* the sandbox tunnel adds ~0.5-1.2 ms per EXECUTION and, critically,
  `jax.block_until_ready` does NOT wait for completion on this backend —
  only a host transfer of (a slice of) the result does;
* executions are chained INSIDE one jitted fori_loop (each iteration's
  output feeds the next, with the dropped RNS row padded back so shapes
  stay static), so neither dispatch latency nor memoization can fake it;
* the reported number is the DIFFERENTIAL between a long and a short chain,
  i.e. pure marginal device throughput.

vs_baseline: measured reference comparator (BASELINE.md "x86 comparator
correction", r4 refresh): 28.061 ops/s/socket fastest observation for the
same pipeline, reference built Release -O3 -march=native (no HEXL;
network-fetch forbidden here).
"""

from __future__ import annotations

import json
import time

import numpy as np

# tools/oracle/bench_reference.cpp re-measured on an idle host (r2
# correction; r4 refresh on a quiet box raised the fastest observation
# from 26.6 — range that session 22.6-28.1): the honest comparator is
# the FASTEST observation (BASELINE.md fair-measurement notes).
REFERENCE_OPS_PER_S = 28.061

# Best measurement validated ON HARDWARE, used only as a clearly-flagged
# fallback when the tunnel is unreachable at bench time (it has day-long
# outages). Update when a fresh on-TPU run lands (BASELINE.md headline).
# "mode" is the flag suffix it was measured under ("" = --parity alpha=1).
LAST_VALIDATED = {"value": 1162.9, "measured": "2026-08-19", "batch": 16,
                  "mode": "_hybrid2_fused"}


def _backend_up(timeout_s: float = 300.0) -> bool:
    """Probe TPU-backend liveness in a subprocess (jax.devices() hangs
    indefinitely when the tunnel is down; a subprocess can be killed)."""
    import subprocess
    import sys

    code = ("import jax, sys; d = jax.devices(); "
            "sys.exit(0 if d and d[0].platform != 'cpu' else 1)")
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                           capture_output=True)
        return r.returncode == 0
    except (subprocess.TimeoutExpired, OSError):
        return False


def main(batches=(16,), alpha=2, fused=True):
    """Default mode is the framework's FASTEST configuration — hybrid
    keyswitching (alpha=2 GHS digits, same depth and security budget) with
    the fused relinearize+rescale tail. `--parity` selects the reference's
    exact algorithm (alpha=1, sequential mod-downs) for apples-to-apples
    algorithm comparison; the x86 comparator only implements that one."""
    if not _backend_up():
        # The tunnel is down: report the last on-hardware measurement,
        # explicitly flagged stale, instead of hanging forever or printing
        # nothing. Never silently bench on the CPU fallback backend.
        mode = (f"_hybrid{alpha}" if alpha > 1 else "") + ("_fused" if fused else "")
        if mode != LAST_VALIDATED["mode"]:
            # no on-hardware measurement exists for this mode yet: report
            # the best VALIDATED measurement, clearly labeled with ITS mode,
            # rather than attributing it to the requested one
            print(json.dumps({
                "metric": "ckks_n16384_L8_mult_relin_rescale"
                          f"{LAST_VALIDATED['mode']} (axon)",
                "value": LAST_VALIDATED["value"],
                "unit": "ops/s/chip",
                "vs_baseline": round(
                    LAST_VALIDATED["value"] / REFERENCE_OPS_PER_S, 3),
                "stale": True,
                "note": "TPU tunnel unreachable at bench time; requested "
                        f"mode '{mode or 'parity'}' has no on-hardware "
                        "measurement yet — value is the best validated "
                        f"measurement ({LAST_VALIDATED['measured']}, "
                        f"B={LAST_VALIDATED['batch']}, mode "
                        f"'{LAST_VALIDATED['mode'] or 'parity'}'; "
                        "see BASELINE.md)",
            }), flush=True)
            return
        print(json.dumps({
            "metric": f"ckks_n16384_L8_mult_relin_rescale{mode} (axon)",
            "value": LAST_VALIDATED["value"],
            "unit": "ops/s/chip",
            "vs_baseline": round(LAST_VALIDATED["value"] / REFERENCE_OPS_PER_S, 3),
            "stale": True,
            "note": "TPU tunnel unreachable at bench time; value is the last "
                    f"on-hardware measurement ({LAST_VALIDATED['measured']}, "
                    f"B={LAST_VALIDATED['batch']}; see BASELINE.md)",
        }), flush=True)
        return

    import os

    import jax
    import jax.numpy as jnp

    # persistent compile cache: tunnel compiles cost minutes; repeats hit disk
    os.makedirs("/root/.cache/jax", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from seal_tpu import (
        CoeffModulus, Decryptor, EncryptionParameters, Encryptor, Evaluator,
        KeyGenerator, SEALContext, SecLevelType,
    )
    from seal_tpu.encryption_params import SchemeType
    from seal_tpu.ckks import CKKSEncoder

    # Setup (keygen/encrypt) runs eagerly — pin it to the CPU backend; the
    # timed pipeline is one jitted function on the default (TPU) backend.
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = jax.devices()[0]
    target = jax.devices()[0]

    n = 16384
    if alpha == 1:
        # the reference's algorithm: 8 data primes + 1 special = 438 bits
        # = MaxBitCount(16384, tc128)
        bits = [48] * 8 + [54]
    else:
        # hybrid keyswitch (--hybrid): SAME depth (8 data primes), SAME
        # 128-bit security budget (8*44 + alpha*ceil(86/alpha) <= 438)
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

    rk.keys = [jax.device_put(k, target) if k is not None else None for k in rk.keys]

    def one(x_pair, y_pair):
        ca = ct1.copy(); ca.data = x_pair
        cb = ct2.copy(); cb.data = y_pair
        if fused:
            # --fused: ONE mod-down by P*q_last (Evaluator.relinearize_rescale)
            return ev.relinearize_rescale(ev.multiply(ca, cb), rk).data
        return ev.rescale_to_next(ev.relinearize(ev.multiply(ca, cb), rk)).data

    L = ct1.data[0].shape[-2]

    def chained(x, y, steps):
        def body(i, cur):
            out = jax.vmap(one)(cur, y)
            # pad the dropped RNS row back so the loop carry keeps its shape
            lo = jnp.concatenate([out[0], cur[0][:, :, L - 1:, :]], axis=2)
            hi = jnp.concatenate([out[1], cur[1][:, :, L - 1:, :]], axis=2)
            return (lo, hi)
        return jax.lax.fori_loop(0, steps, body, x)

    for B in batches:
        # B=16 saturates the chip (see BASELINE.md saturation curve).
        a, b = ct1.copy(), ct2.copy()
        a.data = jax.device_put(
            tuple(jnp.broadcast_to(d, (B,) + d.shape) for d in ct1.data), target)
        b.data = jax.device_put(
            tuple(jnp.broadcast_to(d, (B,) + d.shape) for d in ct2.data), target)

        with jax.default_device(target):
            fn = jax.jit(chained)
            out = fn(a.data, b.data, 1)
            # forces completion (block_until_ready lies here)
            _ = np.asarray(out[0][0, 0, 0, :2])

            def run(steps):
                t0 = time.perf_counter()
                o = fn(a.data, b.data, steps)
                _ = np.asarray(o[0][0, 0, 0, :2])
                return time.perf_counter() - t0

            run(2)
            # min EACH chain length over repeats, then subtract — min over
            # (long-short) pairs picks the most favorable noise draw and can
            # report an optimistic (or even negative) marginal
            short, long_ = 2, max(18 // max(B // 16, 1), 4)
            ts = min(run(short) for _ in range(4))
            tl = min(run(long_) for _ in range(4))
            dt = (tl - ts) / (long_ - short)

        ops_per_sec = B / dt
        hyb = (f"_hybrid{alpha}" if alpha > 1 else "") + ("_fused" if fused else "")
        print(json.dumps({
            "metric": f"ckks_n{n}_L8_mult_relin_rescale{hyb} ({target.platform})"
                      + (f" B={B}" if len(batches) > 1 else ""),
            "value": round(ops_per_sec, 3),
            "unit": "ops/s/chip",
            "vs_baseline": round(ops_per_sec / REFERENCE_OPS_PER_S, 3),
        }), flush=True)


if __name__ == "__main__":
    import sys

    args = sys.argv[1:]
    alpha, fused = 2, True       # default: fastest mode (hybrid2 + fused)
    if "--parity" in args:
        args.remove("--parity")  # the reference's exact algorithm
        alpha, fused = 1, False
    if "--hybrid" in args:
        args.remove("--hybrid")
        alpha, fused = 2, False
    if "--fused" in args:
        args.remove("--fused")
        fused = True
    for a in list(args):
        if a.startswith("--alpha="):
            alpha = int(a.split("=")[1])
            args.remove(a)
    main(tuple(int(a) for a in args) or (16,), alpha=alpha, fused=fused)
