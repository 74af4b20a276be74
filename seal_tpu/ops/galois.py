"""Galois automorphisms x -> x^elt on RNS polys.

Parity: seal::util::GaloisTool (/root/reference/native/src/seal/util/
galois.{h,cpp}): NTT-domain permutation tables (generate_table_ntt :20-51),
step <-> element map with generator 3 (get_elt_from_step :53-95),
get_elts_all :106-130, coefficient-domain automorphism with sign fix
(apply_galois :148-190).

TPU design: automorphisms are single gathers. The NTT-domain permutation is
precomputed per Galois element as an index vector; the coefficient-domain
map is a (gather, negate-mask) pair. Both cached per element.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from seal_tpu.ops import limb
from seal_tpu.ops.modring import ModConsts
from seal_tpu.utils import numth

GENERATOR = 3


class GaloisTool:
    def __init__(self, coeff_count_power: int):
        self.coeff_count_power = coeff_count_power
        self.coeff_count = 1 << coeff_count_power
        self._ntt_tables: dict[int, jnp.ndarray] = {}
        self._coeff_tables: dict[int, tuple] = {}

    # -- step <-> element ------------------------------------------------------

    def get_elt_from_step(self, step: int) -> int:
        n = self.coeff_count
        m = 2 * n
        if step == 0:
            return m - 1
        sign = step < 0
        pos = abs(step)
        if pos >= (n >> 1):
            raise ValueError("step count too large")
        if sign:
            step = (n >> 1) - pos
        else:
            step = pos
        elt = 1
        for _ in range(step):
            elt = (elt * GENERATOR) % m
        return elt

    def get_elts_from_steps(self, steps) -> list[int]:
        return [self.get_elt_from_step(s) for s in steps]

    def get_elts_all(self) -> list[int]:
        m = 2 * self.coeff_count
        elts = [m - 1]
        pos = GENERATOR
        neg = numth.invert_uint_mod(GENERATOR, m)
        for _ in range(self.coeff_count_power - 1):
            elts.append(pos)
            pos = (pos * pos) % m
            elts.append(neg)
            neg = (neg * neg) % m
        return elts

    # -- permutation tables ------------------------------------------------------

    def _ntt_table(self, galois_elt: int) -> jnp.ndarray:
        tab = self._ntt_tables.get(galois_elt)
        if tab is None:
            n = self.coeff_count
            logn = self.coeff_count_power
            idx = np.empty(n, dtype=np.int32)
            for i in range(n, 2 * n):
                reversed_i = numth.reverse_bits(i, logn + 1)
                index_raw = (galois_elt * reversed_i) >> 1
                index_raw &= n - 1
                idx[i - n] = numth.reverse_bits(index_raw, logn)
            # cache as NUMPY: a jnp array created while tracing would be a
            # tracer and leak out of the jit scope on reuse
            tab = idx
            self._ntt_tables[galois_elt] = tab
        return tab

    def _coeff_table(self, galois_elt: int):
        tab = self._coeff_tables.get(galois_elt)
        if tab is None:
            n = self.coeff_count
            # out[index(i)] = ±in[i]  ->  invert to gather form:
            # out[k] = sign(src[k]) * in[src[k]]
            src = np.empty(n, dtype=np.int32)
            neg = np.empty(n, dtype=bool)
            index_raw = 0
            for i in range(n):
                index = index_raw & (n - 1)
                src[index] = i
                neg[index] = bool((index_raw >> self.coeff_count_power) & 1)
                index_raw += galois_elt
            tab = (src, neg)  # numpy, not jnp: see _ntt_table cache note
            self._coeff_tables[galois_elt] = tab
        return tab

    # -- application ----------------------------------------------------------------

    def apply_galois_ntt(self, x: limb.U64Pair, galois_elt: int) -> limb.U64Pair:
        """NTT-domain automorphism: one gather along the coefficient axis
        (galois.cpp:192+)."""
        self._validate(galois_elt)
        tab = self._ntt_table(galois_elt)
        return x[0][..., tab], x[1][..., tab]

    def apply_galois(self, x: limb.U64Pair, galois_elt: int, mc: ModConsts) -> limb.U64Pair:
        """Coefficient-domain automorphism with negacyclic sign fix
        (galois.cpp:148-190)."""
        self._validate(galois_elt)
        src, neg = self._coeff_table(galois_elt)
        g = (x[0][..., src], x[1][..., src])
        negated = limb.neg_mod(g, mc.q)
        return limb.select64(neg, negated, g)

    def _validate(self, galois_elt: int):
        if not (galois_elt & 1) or galois_elt >= 2 * self.coeff_count:
            raise ValueError("Galois element is not valid")

    @staticmethod
    def get_index_from_elt(galois_elt: int) -> int:
        return (galois_elt - 1) >> 1
