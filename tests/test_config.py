"""Runtime configuration surface (seal_tpu/config.py; SURVEY §5.6 —
the analogue of the reference's CMake flag system, CMakeLists.txt:61-285)."""

import jax

from seal_tpu import config as cfg


def test_enable_compile_cache_points_jax_at_dir(tmp_path):
    """enable_compile_cache creates the directory and repoints JAX's
    persistent compilation cache; previous settings are restored so the
    suite's own cache (tests/conftest.py) keeps working."""
    prev_dir = jax.config.jax_compilation_cache_dir
    prev_secs = jax.config.jax_persistent_cache_min_compile_time_secs
    prev_size = jax.config.jax_persistent_cache_min_entry_size_bytes
    try:
        d = cfg.enable_compile_cache(str(tmp_path / "xla_cache"))
        assert d == str(tmp_path / "xla_cache")
        assert (tmp_path / "xla_cache").is_dir()
        assert jax.config.jax_compilation_cache_dir == d
        assert jax.config.jax_persistent_cache_min_compile_time_secs == 0.0
        assert jax.config.jax_persistent_cache_min_entry_size_bytes == -1
    finally:
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", prev_secs)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", prev_size)


def test_dispatch_gates_respect_never_and_bounds():
    """Kernel dispatch flags: 'never' and the n-bounds force the XLA path
    regardless of backend."""
    prev = cfg.config.use_pallas_ntt
    try:
        cfg.config.use_pallas_ntt = "never"
        assert not cfg.pallas_ntt_enabled(16384)
        cfg.config.use_pallas_ntt = "always"
        assert cfg.pallas_ntt_enabled(16384)
        assert not cfg.pallas_ntt_enabled(cfg.config.pallas_ntt_min_n // 2)
    finally:
        cfg.config.use_pallas_ntt = prev
    assert not cfg.galois_matmul_enabled(16384)  # default is "gather"
