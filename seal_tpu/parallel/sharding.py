"""Multi-chip scaling: ciphertext-batch (DP) and RNS-tower (TP) sharding.

The reference is single-threaded, single-address-space C++ (SURVEY.md §2.11
— no distributed backend exists there); this module DEFINES the parallelism
map for the TPU rebuild:

* DP   — independent ciphertexts sharded over a leading batch axis; no
         communication.
* TP   — the L prime-tower axis of [.., L, N] tensors sharded across chips;
         NTT and elementwise ops are per-prime independent, while base
         conversion / key-switch inner products contract over L and XLA
         inserts the psum/all-gather collectives over ICI.
* SP   — the coefficient axis, via the four-step NTT (parallel/fourstep.py):
         two tiled all_to_all transposes per transform (O(n/P) bytes per
         shard; an all_gather route stays selectable), local cyclic
         sub-NTTs, bit-identical to the single-chip kernel.

Everything rides jax.sharding + jit: pick the mesh, annotate shardings, let
XLA place collectives (no custom transport). Multi-host: the same code under
jax.distributed.initialize.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from seal_tpu.dtypes import Ciphertext


class HEMesh:
    """A (dp, tp) device mesh for homomorphic workloads."""

    def __init__(self, dp: int = 1, tp: int = 1, devices=None):
        if devices is None:
            devices = jax.devices()
        if dp * tp > len(devices):
            raise ValueError(f"mesh {dp}x{tp} needs {dp*tp} devices, have {len(devices)}")
        grid = np.asarray(devices[: dp * tp]).reshape(dp, tp)
        self.mesh = Mesh(grid, ("dp", "tp"))
        self.dp = dp
        self.tp = tp

    def ciphertext_spec(self, batched: bool) -> P:
        """[B?, size, L, N]: batch over dp, tower over tp."""
        if batched:
            return P("dp", None, "tp", None)
        return P(None, "tp", None)

    def sharding(self, batched: bool) -> NamedSharding:
        return NamedSharding(self.mesh, self.ciphertext_spec(batched))

    def __enter__(self):
        self._cm = self.mesh.__enter__()
        return self

    def __exit__(self, *args):
        return self.mesh.__exit__(*args)


def batch_ciphertexts(cts: list[Ciphertext]) -> Ciphertext:
    """Stack same-shape ciphertexts into one with a leading batch axis.
    Metadata is taken from the first (all must match)."""
    first = cts[0]
    for ct in cts[1:]:
        if ct.parms_id != first.parms_id or ct.is_ntt_form != first.is_ntt_form:
            raise ValueError("ciphertexts must share parameters and form")
    out = first.copy()
    out.data = (
        jnp.stack([ct.data[0] for ct in cts]),
        jnp.stack([ct.data[1] for ct in cts]),
    )
    return out


def unbatch_ciphertexts(ct: Ciphertext) -> list[Ciphertext]:
    outs = []
    for b in range(ct.data[0].shape[0]):
        c = ct.copy()
        c.data = (ct.data[0][b], ct.data[1][b])
        outs.append(c)
    return outs


def shard_ciphertext(ct: Ciphertext, hm: HEMesh, batched: bool = False) -> Ciphertext:
    out = ct.copy()
    out.data = jax.device_put(ct.data, hm.sharding(batched))
    return out


def vmap_pipeline(fn, hm: HEMesh | None = None):
    """vmap a single-ciphertext evaluator pipeline over batched ciphertexts;
    when a mesh is given, jit with dp/tp shardings so the batch axis runs
    data-parallel and the tower axis tensor-parallel."""
    mapped = jax.vmap(fn)
    if hm is None:
        return jax.jit(mapped)
    return jax.jit(mapped, in_shardings=hm.sharding(batched=True),
                   out_shardings=hm.sharding(batched=True))
