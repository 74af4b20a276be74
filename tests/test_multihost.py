"""Real multi-process "multi-host" execution (SURVEY §5.8, §2.11).

Spawns TWO OS processes — each its own XLA CPU client, one local device —
joined by `jax.distributed.initialize` with gloo cross-process collectives
(the sandbox's DCN stand-in). The child (`tools/multihost_runner.py`) runs

  * the REAL `tp_relinearize` keyswitch with its single exact psum crossing
    the process boundary, bit-compared against the single-chip Evaluator;
  * a DP-sharded dyadic batch over the global mesh, bit-compared unsharded;
  * the SP four-step NTT with the coefficient axis split across the two
    processes (its transpose/all_gather also crosses the boundary).

This upgrades the BASELINE multi-host claim from an analytic model
(tools/scaling_model.py) to executed code: the same program text runs on a
real pod slice with XLA lowering the identical collectives onto ICI/DCN.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
RUNNER = ROOT / "tools" / "multihost_runner.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_four_process_mixed_topology_hoisted_fused():
    """4 processes x 2 local devices (mixed intra-process "ICI" + gloo
    "DCN" links, tp=8): the r4 surface — hoisted rotation batch and the
    fused relinearize+rescale tail — crosses the process boundary through
    the TP keyswitch, bit-exact vs single-chip (VERDICT r4 item 5)."""
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        " ".join(f for f in env.get("XLA_FLAGS", "").split()
                 if "device_count" not in f)
        + " --xla_force_host_platform_device_count=2").strip()
    procs = [
        subprocess.Popen(
            [sys.executable, str(RUNNER), "--pid", str(pid),
             "--nprocs", "4", "--port", str(port), "--legs", "r5"],
            cwd=ROOT, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(4)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=560)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"host {pid} failed:\n{out}"
        assert ("hoisted 2-rotation batch over tp=8 across 4 processes: "
                "BITEXACT") in out, out
        assert ("fused relinearize+rescale over tp=8 across 4 processes: "
                "BITEXACT") in out, out
        assert "ALL OK" in out, out


def test_two_process_tp_and_dp_bitexact():
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # one local device per process: the mesh axis comes from the processes
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=1").strip()
    procs = [
        subprocess.Popen(
            [sys.executable, str(RUNNER), "--pid", str(pid),
             "--nprocs", "2", "--port", str(port)],
            cwd=ROOT, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=560)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"host {pid} failed:\n{out}"
        assert "TP relinearize over tp=2 (psum across 2 processes): BITEXACT" in out, out
        assert "DP dyadic batch" in out and "BITEXACT" in out, out
        assert "SP four-step NTT n=256 over 2 shards across 2 processes: BITEXACT" in out, out
        assert "ALL OK" in out, out
