"""TPU microbench: Pallas fused NTT vs XLA stage-by-stage NTT."""

import time

import jax
import numpy as np


def main():
    from seal_tpu.modulus import CoeffModulus
    from seal_tpu.ops import ntt as ntt_mod
    from seal_tpu.ops import ntt_pallas as npk
    from seal_tpu.ops import limb
    from seal_tpu.dtypes import to_device

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    n, log_n, L, batch = 16384, 14, 8, 4

    with jax.default_device(cpu):
        qs = [int(m) for m in CoeffModulus.create(n, [50] * L)]
        t = ntt_mod.build_device_tables(log_n, qs)
        pt = npk.build_pallas_tables(log_n, qs)
        rng = np.random.default_rng(0)
        x_host = np.stack(
            [rng.integers(0, q, size=(batch, n), dtype=np.uint64) for q in qs], axis=1
        )
        x = to_device(x_host)
        ref = ntt_mod.ntt_forward(x, t)
        ref_np = (np.asarray(ref[0]), np.asarray(ref[1]))

    x = jax.device_put(x, tpu)
    t = jax.device_put(t, tpu)
    pt = jax.device_put(pt, tpu)

    # correctness of the compiled kernel on real hardware
    got = jax.jit(lambda v: npk.ntt_forward_pallas(v, pt))(x)
    jax.block_until_ready(got)
    ok = np.array_equal(np.asarray(got[0]), ref_np[0]) and np.array_equal(
        np.asarray(got[1]), ref_np[1])
    print("pallas fwd matches XLA on TPU:", ok)

    inv_ref = jax.jit(lambda v: ntt_mod.ntt_inverse(v, t))(got)
    inv_got = jax.jit(lambda v: npk.ntt_inverse_pallas(v, pt))(got)
    jax.block_until_ready((inv_ref, inv_got))
    ok = np.array_equal(np.asarray(inv_got[0]), np.asarray(inv_ref[0]))
    print("pallas inv matches XLA on TPU:", ok)

    ITERS = 32

    def timeit(fn, reps=5):
        out = fn(x)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(x)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / reps / ITERS

    def loop(body):
        def run(v):
            return jax.lax.fori_loop(0, ITERS, lambda i, a: body(a), v)
        return jax.jit(run)

    xla_fn = loop(lambda v: ntt_mod.ntt_forward(v, t))
    pal_fn = loop(lambda v: npk.ntt_forward_pallas(v, pt))
    t_xla = timeit(xla_fn)
    t_pal = timeit(pal_fn)
    per_ntt = batch * L
    print(f"XLA NTT:    {t_xla*1e6:.1f} us/iter = {per_ntt/t_xla:.0f} NTT/s")
    print(f"Pallas NTT: {t_pal*1e6:.1f} us/iter = {per_ntt/t_pal:.0f} NTT/s")
    print(f"speedup: {t_xla/t_pal:.2f}x")


if __name__ == "__main__":
    main()
