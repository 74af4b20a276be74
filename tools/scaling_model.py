"""Scaling-efficiency model for the BASELINE multi-host targets.

No multi-chip hardware is reachable from this sandbox (one tunneled v5e
chip), so the multi-host claims are DERIVED, not measured — this tool makes
the derivation explicit and reproducible from (a) measured single-chip op
times (BASELINE.md honest differentials) and (b) the exact collective
payload sizes of the sharded paths (parallel/keyswitch.py TPKeySwitch: ONE
psum of 21-bit limb splits; parallel/fourstep.py: two tiled all_to_alls
on the default 'a2a' route, O(n/P) bytes per shard), against
stated link-bandwidth assumptions.

Model
-----
* DP (ciphertext batch over chips/hosts): zero steady-state communication —
  efficiency = 1.0 while every chip keeps a saturating local batch
  (B>=16 measured saturation; 4096-ct batch saturates up to 256 chips).
* TP (RNS tower/digit axis over chips): per keyswitch, compute scales ~1/P
  (decompose NTTs are per-digit independent) and the ONE exact psum moves
  a fixed payload M = N * 2(components) * 6(21-bit splits) * 4 B
  (keyswitch.py _SPLIT factors); ring all-reduce time = 2M(P-1)/P / BW.
  efficiency(P) = t_comp / (t_comp + P * t_comm_overlap-free)  [pessimistic:
  no compute/comm overlap is assumed].
* Cross-host DP over DCN: same as DP (no steady-state traffic); key/ct
  distribution is a one-time cost amortized over the batch stream.

Usage: python tools/scaling_model.py [--n 16384] [--L 8]
       [--relin-us 1132] [--ici-gbs 180] [--dcn-gbs 25]
"""

from __future__ import annotations

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--L", type=int, default=8)
    ap.add_argument("--relin-us", type=float, default=1132.0,
                    help="measured single-chip relinearize (BASELINE grid)")
    ap.add_argument("--pipeline-us", type=float, default=897.0,
                    help="measured single-chip mult+relin+rescale per ct: "
                         "the late-r4 SUSTAINED production-recipe number "
                         "(1115 ops/s at 4096 cts, B=64 --submap 16, "
                         "tools/bench_sustained.py — independent per-chunk "
                         "dispatches with drain), not the 1135 ops/s "
                         "chained marginal; pass 1300 for the conservative "
                         "short-stream flat-B=16 figure")
    ap.add_argument("--ici-gbs", type=float, default=180.0,
                    help="per-chip ICI all-reduce bandwidth assumption (GB/s)")
    ap.add_argument("--dcn-gbs", type=float, default=25.0)
    ap.add_argument("--batch", type=int, default=4096,
                    help="BASELINE config #5 ciphertext batch")
    ap.add_argument("--alpha", type=int, default=1,
                    help="hybrid special-prime count: scales the relin "
                         "compute by the pinned transform-row ratio and "
                         "widens the psum to L+alpha extended rows")
    args = ap.parse_args()

    n = args.n
    L = args.L
    a = args.alpha
    relin_us = args.relin_us
    if a > 1:
        # scale measured alpha=1 relin compute by the executable
        # transform-count pin (test_alpha2_halves_decompose_transform_count,
        # diagonal skip included): rows(alpha) / rows(1)
        rows1 = L * L + 2 * L
        rowsa = -(-L // a) * (L + a) - L + 2 * L
        relin_us = relin_us * rowsa / rows1
        print(f"[hybrid alpha={a}: relin compute scaled x{rowsa}/{rows1} "
              f"from the pinned transform counts -> {relin_us:.0f} us]")
    # TPKeySwitch psum payload: [2 components, 3 splits, L+alpha extended key
    # rows, N] u32 (parallel/keyswitch.py reduce(): `jax.lax.psum(... )
    # # [2, 3, Lp1, n]`; 21-bit limb splits keep the psum exact).
    # dryrun_multichip's "psum 1.97 MB" is this same formula at L=4.
    M = 2 * 3 * (L + a) * n * 4
    print(f"== TP keyswitch: psum payload {M/1e6:.2f} MB, "
          f"single-chip relin {relin_us:.0f} us ==")
    rows = []
    tp_counts = [p for p in (2, 4, 8) if (L if a == 1 else -(-L // a)) % p == 0]
    for P in tp_counts:
        t_comp = relin_us / P
        t_comm = 2 * M * (P - 1) / P / (args.ici_gbs * 1e9) * 1e6
        eff = (relin_us / P) / (t_comp + t_comm)
        rows.append((P, t_comp, t_comm, eff))
        print(f"  TP={P}: compute {t_comp:7.1f} us + psum {t_comm:5.1f} us "
              f"-> speedup {relin_us/(t_comp+t_comm):4.2f}x, "
              f"efficiency {eff*100:5.1f}%")

    print(f"\n== DP over chips (no steady-state collectives) ==")
    B_sat = 16
    max_chips = args.batch // B_sat
    print(f"  measured saturation batch {B_sat}/chip; a {args.batch}-ct "
          f"stream keeps {max_chips} chips saturated -> efficiency ~100% "
          f"to {max_chips} chips, dropping only when per-chip batch < {B_sat}")

    print(f"\n== SP four-step NTT (coefficient axis over chips) ==")
    # parallel/fourstep.py: the default 'a2a' route communicates TWO tiled
    # all_to_alls of the shard's [L, M] block (each moves (P-1)/P of it);
    # the legacy 'gather' route all_gathers the whole [L, n] poly per shard.
    for P in (2, 4, 8):
        Mloc = n // P
        a2a_bytes = 2 * (P - 1) / P * L * Mloc * 8     # u32 (lo,hi) pairs
        gather_bytes = (P - 1) * L * Mloc * 8
        print(f"  SP={P}: per-shard bytes/transform a2a "
              f"{a2a_bytes/1e3:7.1f} kB vs gather {gather_bytes/1e3:7.1f} kB "
              f"({gather_bytes/a2a_bytes:4.1f}x less traffic; ratio -> P/2)")

    print(f"\n== PP systolic pipeline (stage axis over chips) ==")
    # parallel/pipeline.py pipeline_apply_sharded: per step each stage
    # ppermutes its full payload (the [4, L, n] u32-pair microbatch slot,
    # census-verified in dryrun_multichip's pp leg) to the next device;
    # chunk feed all_gather + psum_scatter return add 2/P payloads per
    # chunk. Steady-state efficiency = bubble term M/(M+P-1) times the
    # compute/handoff ratio; XLA overlaps the async ppermute with the next
    # step's compute, so the zero-overlap number is the floor.
    pp_payload = 4 * L * n * 4 * 2          # [4, L, n] u32 (lo, hi)
    t_stage = args.pipeline_us              # one mult+relin+rescale stage
    for P in (2, 4, 8):
        t_perm = pp_payload / (args.ici_gbs * 1e9) * 1e6
        for Mb in (P, 8 * P):
            bubble = Mb / (Mb + P - 1)
            eff0 = bubble * t_stage / (t_stage + t_perm)
            eff1 = bubble
            print(f"  PP={P} M={Mb:3d}: handoff {pp_payload/1e6:.2f} MB = "
                  f"{t_perm:5.1f} us/step -> efficiency "
                  f"{eff0*100:5.1f}% (no overlap) .. {eff1*100:5.1f}% "
                  f"(full overlap; bubble-limited)")

    print(f"\n== DP across hosts over DCN (BASELINE config #5) ==")
    # one-time distribution: relin keys [d, 2, L+1, 2, N] u32 pairs + ct batch
    d = args.L
    key_bytes = d * 2 * (args.L + 1) * 2 * n * 4
    ct_bytes = 2 * args.L * 2 * n * 4
    for hosts in (2, 4):
        bcast = key_bytes / (args.dcn_gbs * 1e9) * 1e6
        stream = args.batch / hosts * args.pipeline_us
        amort = stream / (stream + bcast)
        print(f"  {hosts} hosts: key bcast {key_bytes/1e6:.0f} MB = "
              f"{bcast/1e3:.1f} ms one-time vs {stream/1e3:.0f} ms of "
              f"pipeline work -> steady-state efficiency "
              f"{amort*100:.1f}% (communication-free thereafter)")

    print(f"\n== TP sensitivity (bandwidth x compute/comm overlap) ==")
    # The headline table above assumes --ici-gbs with ZERO overlap (every
    # psum byte is exposed). Real XLA schedules overlap the all-reduce with
    # the independent per-digit compute to some fraction f; the grid below
    # brackets the claim instead of betting on one point. Break-even: the
    # bandwidth at which efficiency = 80% under f=0.
    print("  eff% rows: P=2 / P=4 / P=8; columns: overlap fraction f")
    for bw in (45.0, 90.0, 180.0, 360.0):
        cells = []
        for f in (0.0, 0.5, 1.0):
            effs = []
            for P in (2, 4, 8):
                t_comp = relin_us / P
                t_comm = 2 * M * (P - 1) / P / (bw * 1e9) * 1e6
                t_total = t_comp + max(t_comm - f * t_comp, 0.0)
                effs.append(t_comp / t_total)
            cells.append("/".join(f"{e*100:.0f}" for e in effs))
        print(f"  ICI {bw:5.0f} GB/s:  f=0 {cells[0]:>9}   "
              f"f=.5 {cells[1]:>9}   f=1 {cells[2]:>9}")
    for P in (2, 4, 8):
        t_comp = relin_us / P
        bw_be = (2 * M * (P - 1) / P) / (0.25 * t_comp / 1e6) / 1e9
        print(f"  break-even for 80% at TP={P} (f=0): {bw_be:.0f} GB/s")

    print("\nAssumptions are explicit inputs (--ici-gbs/--dcn-gbs); the "
          "sensitivity grid above brackets them. The ≥80%-at-2-hosts "
          "BASELINE target is met by construction under DP (no steady-state "
          "traffic) and by the table above under TP.")
    print(json.dumps({
        "psum_MB": round(M / 1e6, 2),
        "tp_efficiency": {str(P): round(e, 3) for P, _, _, e in rows},
        "dp_saturated_chips": max_chips,
    }))


if __name__ == "__main__":
    main()
