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


config = GlobalConfig()


def pallas_ntt_enabled(n: int) -> bool:
    import jax

    if config.use_pallas_ntt == "never" or n < config.pallas_ntt_min_n:
        return False
    if config.use_pallas_ntt == "always":
        return True
    # Respect a `with jax.default_device(...)` override (bench.py pins
    # eager setup to the CPU backend while the jitted pipeline targets the
    # TPU); fall back to the process default backend.
    dd = jax.config.jax_default_device
    if dd is not None:
        # jax.default_device accepts a platform string ('cpu') or a Device
        plat = dd if isinstance(dd, str) else dd.platform
        return plat == "tpu"
    return jax.default_backend() == "tpu"
