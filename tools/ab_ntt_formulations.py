"""Single-process A/B of the NTT butterfly formulations on hardware
(run-to-run variance on the shared tunnel dwarfs the deltas, so all
variants are measured interleaved in ONE process, two rounds each)."""
import time

import numpy as np


def main():
    import jax

    from seal_tpu.modulus import CoeffModulus
    from seal_tpu.ops import ntt as ntt_mod
    from seal_tpu.ops import ntt_pallas as npk
    from seal_tpu.dtypes import to_device

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    n, L, batch = 16384, 8, 4
    log_n = n.bit_length() - 1

    with jax.default_device(cpu):
        qs = [int(m) for m in CoeffModulus.create(n, [50] * L)]
        pt_h = npk.build_pallas_tables(log_n, qs)
        rng = np.random.default_rng(0)
        x_host = np.stack(
            [rng.integers(0, q, size=(batch, n), dtype=np.uint64) for q in qs],
            axis=1)
        x = to_device(x_host)
    x = jax.device_put(x, tpu)
    pt = jax.device_put(pt_h, tpu)

    flags = {
        "lane_T only          ": (False, False, True),
        "roll+select only     ": (False, False, False),
    }
    fns = {}
    for name, (sub, lane, lane_t) in flags.items():
        npk._PAIR_COMPACT_SUBLANE = sub
        npk._PAIR_COMPACT_LANE = lane
        npk._PAIR_COMPACT_LANE_T = lane_t
        fns[name] = jax.jit(lambda v, s, tb=pt: jax.lax.fori_loop(
            0, s, lambda i, a: npk.ntt_forward_pallas(a, tb), v))
        o = fns[name](x, 1)
        _ = np.asarray(o[0][0, 0, :2])
    npk._PAIR_COMPACT_SUBLANE = True
    npk._PAIR_COMPACT_LANE = False
    npk._PAIR_COMPACT_LANE_T = True

    def run(fn, s):
        t0 = time.perf_counter()
        o = fn(x, s)
        _ = np.asarray(o[0][0, 0, :2])
        return time.perf_counter() - t0

    for rnd in range(2):
        for name, fn in fns.items():
            run(fn, 4)
            ts = min(run(fn, 8) for _ in range(4))
            tl = min(run(fn, 264) for _ in range(4))
            d = (tl - ts) / 256 / (batch * L)
            print(f"round{rnd} {name}: {d*1e6:.2f} us/transform", flush=True)


if __name__ == "__main__":
    main()
