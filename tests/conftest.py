"""Test configuration: run JAX on CPU with a virtual 8-device mesh.

The sandbox's sitecustomize registers a tunneled remote TPU ("axon") backend
and hard-sets jax.config jax_platforms="axon,cpu" at interpreter start —
env vars alone don't override it, and per-dispatch latency to that TPU is
seconds. Force the CPU backend via jax.config before any backend initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite's dominant cost is XLA-compiling
# large unrolled limb-arithmetic graphs; repeat runs hit the disk cache.
os.makedirs("/root/.cache/jax", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
# Persist EVERYTHING: eager evaluator paths dispatch hundreds of tiny ops
# whose individual compiles are sub-second (and so are skipped by the
# default 1s threshold) but sum to tens of seconds per cold test module.
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
