"""Analytic roofline for the seal_tpu hot kernels vs measured marginals.

Counts the exact u32 VPU operations the Pallas NTT butterfly and the
key-switch inner product execute (derived from ops/limb.py — every helper's
op count is tallied from its source, not estimated), the HBM bytes each
kernel moves, and compares against the honest differential measurements
(BASELINE.md / tools/results/*.json) to name the binding resource.

Usage: python tools/roofline.py [--n 16384] [--L 8] [--batch 16]
       [--measured-ntt-us 8.2] [--clock-ghz 0.94] [--vpu-issue 1 2 4]

The v5e figures used:
  VPU shape 8x128 = 1024 lanes/core (pallas guide); clock ~0.94 GHz;
  per-lane issue width is not public, so speed-of-light is printed for
  1/2/4 ops/lane/cycle. HBM ~ 819 GB/s/chip.
"""

from __future__ import annotations

import argparse
import json

# --- exact op tallies from seal_tpu/ops/limb.py -----------------------------
# "op" = one u32 VPU instruction (mult, add, sub, shift, and/or, compare,
# select). Casts of a compare to u32 are counted as 1.

OPS = {}
OPS["mul32"] = 4 + 4 + 5 + 3 + 6          # split, 4 mults, mid, lo, hi
OPS["_addc"] = 2                          # add + compare(cast)
OPS["add64"] = OPS["_addc"] + 2           # lo carry + hi add+add
OPS["sub64"] = 4                          # sub, cmp, sub, sub
OPS["lt64"] = 5                           # 2 cmp + eq + and + or
OPS["ge64"] = OPS["lt64"] + 1
OPS["select64"] = 2
OPS["cond_sub"] = OPS["ge64"] + OPS["sub64"] + OPS["select64"]
OPS["mul64"] = 4 * OPS["mul32"] + 6 * OPS["_addc"] + 3   # 4 partials + carries
OPS["mul64_lo"] = OPS["mul32"] + 2 + 1 + 1               # mul32 + 2 mults + 2 adds
OPS["mul64_hi"] = OPS["mul64"]                            # computes full product
OPS["mul_mod_shoup_lazy"] = OPS["mul64_hi"] + 2 * OPS["mul64_lo"] + OPS["sub64"]
OPS["add128"] = 7 * OPS["_addc"] + 4
OPS["mul_add_128"] = OPS["mul64"] + OPS["add128"]


def ntt_butterfly_ops() -> int:
    """Forward Harvey butterfly, pair-compact path (one (u,v) pair):
    cond-sub(u, 2q) + shoup-lazy(v, w) + add64 + (add64 + sub64)."""
    return (OPS["cond_sub"] + OPS["mul_mod_shoup_lazy"] + OPS["add64"]
            + OPS["add64"] + OPS["sub64"])


def ntt_transform(n: int):
    """(vpu_ops, hbm_bytes_data, hbm_bytes_tables) for ONE n-point transform
    of one RNS row (expanded-table kernel, pair-compact butterflies)."""
    import math
    log_n = int(math.log2(n))
    pairs = (n // 2) * log_n
    ops = pairs * ntt_butterfly_ops()
    data = 2 * 8 * n                       # u32 limb pair in + out
    tables = 16 * n * log_n                # (op,quot) 16 B/position/stage
    return ops, data, tables


def keyswitch_inner(n: int, L: int, alpha: int = 1):
    """Key-switch inner product at level L with one special prime (alpha=1):
    decomposed target rows d = L, key rows k = L+alpha, 2 components.
    Per (output row, component): sum over d of mul_add_128 on [n], then a
    Barrett-128 per element (counted in the tail, ~amortized)."""
    d = -(-L // alpha)                     # GHS digits
    k = L + alpha
    macs = d * k * 2 * n
    ops = macs * OPS["mul_add_128"]
    # reads: t_op [d, k(extended), 2 limbs] once + key [d, 2, k] once
    bytes_in = d * k * 8 * n + d * 2 * k * 8 * n
    bytes_out = 2 * k * 16 * n             # 4-limb accumulators out (fused: stays VMEM)
    return ops, bytes_in, bytes_out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--L", type=int, default=8)
    ap.add_argument("--alpha", type=int, default=1)
    ap.add_argument("--clock-ghz", type=float, default=0.94)
    ap.add_argument("--lanes", type=int, default=8 * 128)
    ap.add_argument("--hbm-gbs", type=float, default=819.0)
    ap.add_argument("--measured-ntt-us", type=float, default=8.2,
                    help="honest differential marginal per transform "
                         "(BASELINE.md, B*L=32 grid)")
    ap.add_argument("--measured-relin-us", type=float, default=1132.0,
                    help="honest differential per relinearize at n,L")
    args = ap.parse_args()

    print(f"== limb-emulation op tallies (u32 VPU instructions) ==")
    for k in ("mul32", "mul64", "mul64_lo", "mul_mod_shoup_lazy",
              "mul_add_128"):
        print(f"  {k:22s} {OPS[k]:4d}")
    bf = ntt_butterfly_ops()
    print(f"  {'harvey butterfly':22s} {bf:4d}  (per (u,v) pair)")

    n, L = args.n, args.L
    ops, dbytes, tbytes = ntt_transform(n)
    vpu_rate = args.lanes * args.clock_ghz * 1e9  # ops/s at 1 op/lane/cycle
    print(f"\n== NTT roofline: one {n}-point transform, one RNS row ==")
    print(f"  VPU ops            {ops/1e6:8.2f} M")
    print(f"  HBM data bytes     {dbytes/1e6:8.2f} MB  tables {tbytes/1e6:.2f} MB "
          f"(amortized across the (L,B) grid by table reuse)")
    for issue in (1, 2, 4):
        sol = ops / (vpu_rate * issue) * 1e6
        print(f"  VPU speed-of-light @ {issue} op/lane/cycle: {sol:7.2f} us")
    hbm_floor = dbytes / (args.hbm_gbs * 1e9) * 1e6
    hbm_floor_tab = (dbytes + tbytes) / (args.hbm_gbs * 1e9) * 1e6
    print(f"  HBM floor          {hbm_floor:7.2f} us (data only) / "
          f"{hbm_floor_tab:.2f} us (cold tables)")
    m = args.measured_ntt_us
    print(f"  MEASURED           {m:7.2f} us "
          f"-> {ops/ (m*1e-6) / 1e12:.2f} Tops/s u32 "
          f"({ops/(m*1e-6)/vpu_rate:.2f} ops/lane/cycle achieved)")
    print(f"  verdict: VPU-compute-bound (measured rate is "
          f"{ops/(m*1e-6)/vpu_rate:.2f} ops/lane/cycle; data HBM floor is "
          f"{hbm_floor/m*100:.0f}% of measured)")

    kops, kin, kout = keyswitch_inner(n, L, args.alpha)
    # decompose NTT count: L digits lifted to L+alpha key primes (dense;
    # CKKS diagonal-skip removes L of them) + 2(L+alpha) INTT-equivalents tail
    d = -(-L // args.alpha)
    nntt = d * (L + args.alpha) - (L if args.alpha == 1 else 0)
    print(f"\n== key-switch (relinearize) roofline: n={n} L={L} "
          f"alpha={args.alpha} ==")
    print(f"  inner-product VPU ops {kops/1e6:8.1f} M "
          f"(@1 op/lane/cycle: {kops/vpu_rate*1e6:.0f} us)")
    print(f"  decompose NTTs        {nntt} lifted transforms "
          f"≈ {nntt*ops/1e6:.0f} M ops ≈ {nntt*args.measured_ntt_us:.0f} us "
          f"at the measured NTT rate")
    print(f"  key HBM bytes         {kin/1e6:.1f} MB in "
          f"(floor {kin/(args.hbm_gbs*1e9)*1e6:.0f} us)")
    print(f"  MEASURED relinearize  {args.measured_relin_us:.0f} us "
          f"(attribution: decompose NTTs ~60%, inner+tail ~21%)")
    tot_ops = kops + nntt * ops
    print(f"  verdict: NTT-dominated and VPU-compute-bound end to end "
          f"({tot_ops/ (args.measured_relin_us*1e-6)/vpu_rate:.2f} "
          f"ops/lane/cycle achieved across the whole op)")

    print(json.dumps({
        "n": n, "L": L, "alpha": args.alpha,
        "butterfly_ops": bf,
        "ntt_Mops": round(ops / 1e6, 2),
        "ntt_sol_us_1issue": round(ops / vpu_rate * 1e6, 2),
        "ntt_measured_us": m,
        "ntt_hbm_floor_us": round(hbm_floor, 2),
        "ks_inner_Mops": round(kops / 1e6, 1),
        "decompose_ntts": nntt,
    }))


if __name__ == "__main__":
    main()
