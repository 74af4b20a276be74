"""Runtime configuration (the analogue of the reference's compile-time
flag system, CMakeLists.txt options -> util/config.h.in; SURVEY.md §5.6).

Kernel variants are selected at trace time from this config.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class GlobalConfig:
    # "auto": Pallas kernels on TPU backends, XLA elsewhere.
    # "always"/"never" force the choice (interpret mode when not on TPU).
    use_pallas_ntt: str = "auto"
    # SEAL_THROW_ON_TRANSPARENT_CIPHERTEXT (default ON in the reference)
    throw_on_transparent_ciphertext: bool = True
    # noise sampler: "cbd" (reference default) or "gaussian"
    noise_sampler: str = "cbd"
    # smallest n for which the fused Pallas NTT is used
    pallas_ntt_min_n: int = 256
    # largest n for the fused kernel. Beyond ~16384 the expanded per-stage
    # root tables exceed the ~16 MB VMEM scoped allocation in one pass
    # (measured: 18.11M > 16M at n=32768 on v5e), so the kernel pages
    # itself into stage-range passes (ops/ntt_pallas.py _PASS_TABLE_BYTES)
    # — bit-transparent, one extra HBM roundtrip per extra pass
    pallas_ntt_max_n: int = 65536
    # NTT-domain Galois permutation: "gather" (default — measured at
    # parity with the MXU route on v5e, BASELINE.md r2) or "matmul"
    # (Clos-routed one-hot matmuls; same speed, kept as an option)
    galois_permute: str = "gather"
    # smallest n for which the Clos-routed MXU permutation is used
    galois_matmul_min_n: int = 2048
    # fused Pallas key-switch inner product (ops/keyswitch_pallas.py):
    # keeps the 4-limb accumulator in VMEM across the decomp contraction
    use_pallas_keyswitch: str = "auto"
    pallas_keyswitch_min_n: int = 256
    # Shoup-quotient key-switch inner product: precompute floor(k·2^64/q)
    # for every key element ONCE per loaded key (cached on the key object),
    # then contract with per-term Shoup-lazy products + a conditional-
    # subtraction chain instead of 128-bit accumulation + Barrett-128.
    # Bit-identical (same integer mod q, same representative); used only
    # when the lazy sum provably fits u64 (2·d·max_q < 2^64). Measured
    # NEUTRAL on the v5e headline (1163.7 vs 1162.9 ops/s, BASELINE.md
    # "Shoup inner-product A/B") — the contraction is not multiply-bound
    # there — while doubling the key HBM footprint, so default OFF; kept
    # selectable for toolchains/shapes where the VPU saving materializes
    keyswitch_shoup: bool = False
    # host-side keygen/encrypt-zero math on the native u64 path
    # (seal_tpu/native/poly.py) instead of the XLA:CPU limb emulation —
    # ~10x on a single host core; bit-identical (cross-checked in
    # tests/test_native_poly.py). False forces the JAX path.
    use_native_keygen: bool = True


config = GlobalConfig()


def enable_compile_cache(path: str | None = None) -> str:
    """Opt into JAX's persistent XLA compilation cache for this process.

    seal_tpu's limb-emulated kernels compile into large unrolled XLA graphs;
    a cold process pays seconds of compile time on first use (keygen's
    eager NTT wrappers especially — BASELINE.md "KeyGen timing"). With the
    persistent cache, every later process with the same shapes loads the
    compiled executables from disk instead. Call once, before first use:

        import seal_tpu
        seal_tpu.config.enable_compile_cache()      # ~/.cache/seal_tpu_xla

    Returns the cache directory. (The test suite and the multichip dryrun
    enable the same cache on their own; this is the user-facing switch —
    the analogue of a build cache in the reference's CMake world.)

    Measured on this box (BFV n=4096 default parms, fresh process):
    secret_key 5.9 s -> 3.3 s, public_key 1.0 s -> 0.36 s. Note: on shared
    CPU hosts the XLA:CPU AOT loader may log feature-mismatch warnings
    (pseudo-features like prefer-no-scatter vary run to run); entries that
    don't match are recompiled, outputs are unaffected.
    """
    import os

    import jax

    if path is None:
        path = os.path.join(
            os.path.expanduser("~"), ".cache", "seal_tpu_xla")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return path


def _on_tpu_backend() -> bool:
    """Whether traces built right now target a TPU backend. Respects a
    `with jax.default_device(...)` override (bench.py pins eager setup to
    the CPU backend while the jitted pipeline targets the TPU); falls back
    to the process default backend."""
    import jax

    dd = jax.config.jax_default_device
    if dd is not None:
        # jax.default_device accepts a platform string ('cpu') or a Device
        plat = dd if isinstance(dd, str) else dd.platform
        return plat == "tpu"
    return jax.default_backend() == "tpu"


def pallas_ntt_enabled(n: int) -> bool:
    if (config.use_pallas_ntt == "never" or n < config.pallas_ntt_min_n
            or n > config.pallas_ntt_max_n):
        return False
    if config.use_pallas_ntt == "always":
        return True
    return _on_tpu_backend()


def pallas_keyswitch_enabled(n: int) -> bool:
    if (config.use_pallas_keyswitch == "never"
            or n < config.pallas_keyswitch_min_n):
        return False
    if config.use_pallas_keyswitch == "always":
        return True
    return _on_tpu_backend()


def galois_matmul_enabled(n: int) -> bool:
    """Clos-routed MXU permutation for NTT-domain automorphisms: arbitrary
    minor-axis gathers are scalar loops on TPU (~ms at n=16K), while the
    3-stage one-hot matmul route rides the MXU."""
    import jax

    if config.galois_permute != "matmul" or n < config.galois_matmul_min_n:
        return False
    return True
