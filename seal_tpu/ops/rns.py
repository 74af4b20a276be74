"""RNS machinery: CRT bases, base conversion, and the RNSTool op set.

Parity targets: seal::util::RNSBase (/root/reference/native/src/seal/util/
rns.cpp:18-399), BaseConverter (rns.cpp:400-576), RNSTool (rns.cpp:578-1246).

Host side (exact Python ints): base products, punctured products and their
inverses, base-change matrices, and every derived constant — computed once
per context and shipped to device as u32 limb tensors.

Device side (vectorized jnp over [..., L, N] limb tensors):
* fast base conversion — the inner product with the base-change matrix,
  accumulated lazily in 128 bits and Barrett-reduced once per output prime
  (the "matmul-shaped" op of SURVEY.md §2.4);
* the BEHZ BFV multiplication pipeline (fastbconv_m_tilde, sm_mrq,
  fast_floor, fastbconv_sk);
* modulus switching / rescaling (divide_and_round_q_last[_ntt]);
* BFV decryption rounding via {t, γ} and BGV decrypt mod t.

Deviation from the reference: exact_convert_array's rounding-correction
count v is computed in integer fixed point (Σ x̂_j·⌊2^128/q_j⌋ rounded at
bit 128) instead of C++ doubles (rns.cpp:481-526) — exact whenever the
double version is, with no f64 dependence on TPU.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax.numpy as jnp
import jax.tree_util

from seal_tpu.modulus import Modulus, COEFF_MOD_COUNT_MAX, COEFF_MOD_COUNT_MIN, INTERNAL_MOD_BIT_COUNT
from seal_tpu.ops import limb
from seal_tpu.ops.modring import ModConsts, make_mod_consts, shoup_pair
from seal_tpu.ops import ntt as ntt_mod
from seal_tpu.utils import numth

MASK64 = (1 << 64) - 1


# ---------------------------------------------------------------------------
# Host: RNSBase
# ---------------------------------------------------------------------------

class RNSBase:
    """A coprime CRT base {q_1, ..., q_k} with punctured-product constants
    (parity: rns.cpp:18-257)."""

    def __init__(self, moduli):
        vals = [int(m) for m in moduli]
        if not vals:
            raise ValueError("rnsbase cannot be empty")
        for i, v in enumerate(vals):
            if v < 2:
                raise ValueError("rnsbase is invalid")
            for w in vals[i + 1:]:
                if numth.gcd(v, w) != 1:
                    raise ValueError("rnsbase is invalid (not coprime)")
        self.base = vals
        self.size = len(vals)
        self.base_prod = numth.multiply_many(vals)
        self.punctured_prod = [self.base_prod // v for v in vals]
        self.inv_punctured_prod = []
        for v, p in zip(vals, self.punctured_prod):
            inv = numth.try_invert_uint_mod(p % v, v)
            if inv is None:
                raise ValueError("rnsbase is invalid (punctured product not invertible)")
            self.inv_punctured_prod.append(inv)

    def __getitem__(self, i) -> int:
        return self.base[i]

    def contains(self, value: int) -> bool:
        return int(value) in self.base

    def is_subbase_of(self, other: "RNSBase") -> bool:
        return all(v in other.base for v in self.base)

    def extend(self, other) -> "RNSBase":
        if isinstance(other, RNSBase):
            return RNSBase(self.base + other.base)
        return RNSBase(self.base + [int(other)])

    def drop(self, value: Optional[int] = None) -> "RNSBase":
        if value is None:
            if self.size == 1:
                raise ValueError("cannot drop from base of size 1")
            return RNSBase(self.base[:-1])
        value = int(value)
        if value not in self.base:
            raise ValueError("value is not in the base")
        if self.size == 1:
            raise ValueError("cannot drop from base of size 1")
        return RNSBase([v for v in self.base if v != value])

    def decompose(self, value: int) -> list[int]:
        """Big int -> residues (rns.cpp:259-319)."""
        return [value % v for v in self.base]

    def compose(self, residues) -> int:
        """Residues -> big int in [0, base_prod) (rns.cpp:321-399)."""
        acc = 0
        for x, v, p, ip in zip(residues, self.base, self.punctured_prod, self.inv_punctured_prod):
            acc += p * ((int(x) * ip) % v)
        return acc % self.base_prod


# ---------------------------------------------------------------------------
# Device: base converter
# ---------------------------------------------------------------------------

class BaseConvDevice(NamedTuple):
    """Device constants for ibase -> obase fast conversion."""

    ibase_mc: ModConsts                 # [Li, 1]
    obase_mc: ModConsts                 # [Lo, 1]
    inv_punct_op: limb.U64Pair          # [Li, 1]
    inv_punct_qt: limb.U64Pair
    matrix: limb.U64Pair                # [Lo, Li]: punctured_prod[j] mod o_p
    # for exact_convert (obase size 1): ratio words floor(2^128/q_j) [Li, 3*?]
    ibase_ratio_limbs: tuple            # tuple of 5 u32 arrays [Li, 1] (160-bit)
    q_mod_p: limb.U64Pair               # [1, 1]: prod(ibase) mod obase[0]


def _ratio_limbs(qs, width=5):
    """floor(2^128/q) as `width` u32 limbs, shaped [L, 1] each."""
    import numpy as np

    arrs = []
    for k in range(width):
        vals = [((1 << 128) // q >> (32 * k)) & 0xFFFFFFFF for q in qs]
        arrs.append(jnp.asarray(np.asarray(vals, dtype=np.uint32)).reshape(len(qs), 1))
    return tuple(arrs)


def make_base_conv(ibase: RNSBase, obase: RNSBase) -> BaseConvDevice:
    Li, Lo = ibase.size, obase.size
    inv_op, inv_qt = shoup_pair(
        [[v] for v in ibase.inv_punctured_prod], [[v] for v in ibase.base], shape=(Li, 1)
    )
    matrix = limb.arr_to_u64(
        [[pj % p for pj in ibase.punctured_prod] for p in obase.base], shape=(Lo, Li)
    )
    return BaseConvDevice(
        ibase_mc=make_mod_consts(ibase.base),
        obase_mc=make_mod_consts(obase.base),
        inv_punct_op=inv_op,
        inv_punct_qt=inv_qt,
        matrix=matrix,
        ibase_ratio_limbs=_ratio_limbs(ibase.base),
        q_mod_p=limb.arr_to_u64([[ibase.base_prod % obase.base[0]]], shape=(1, 1)),
    )


def _scaled_residues(x, bc: BaseConvDevice):
    """x̂_j = x_j · (q/q_j)^{-1} mod q_j (the first half of fast_convert)."""
    return limb.mul_mod_shoup(x, bc.inv_punct_op, bc.inv_punct_qt, bc.ibase_mc.q)


def _matrix_dot(temp, bc: BaseConvDevice):
    """Σ_j x̂_j · (q/q_j mod o_p), 128-bit lazy accumulation per output prime.

    temp: [..., Li, N] -> out [..., Lo, N].
    """
    Li = temp[0].shape[-2]
    Lo = bc.matrix[0].shape[0]
    n = temp[0].shape[-1]
    batch = temp[0].shape[:-2]
    out_shape = batch + (Lo, n)
    zeros = jnp.zeros(out_shape, dtype=jnp.uint32)
    acc = (zeros, zeros, zeros, zeros)
    for j in range(Li):
        a = (temp[0][..., j:j + 1, :], temp[1][..., j:j + 1, :])     # [..., 1, N]
        m = (bc.matrix[0][:, j:j + 1], bc.matrix[1][:, j:j + 1])     # [Lo, 1]
        acc = limb.mul_add_128(acc, a, m)
    return limb.barrett_reduce_128(
        (acc[0], acc[1]), (acc[2], acc[3]),
        bc.obase_mc.q, bc.obase_mc.ratio0, bc.obase_mc.ratio1,
    )


def fast_convert_array(x, bc: BaseConvDevice):
    """ibase residues [..., Li, N] -> obase residues [..., Lo, N]
    (parity: rns.cpp:418-463)."""
    return _matrix_dot(_scaled_residues(x, bc), bc)


def exact_convert_parts(x, bc: BaseConvDevice):
    """The two halves of exact_convert_array, returned SEPARATELY (dot and
    the v-correction term): combining them inside one XLA:CPU executable
    triggers a slice-fusion pathology (see decryptor.py _phase_fn); the
    final (dot - v_q) mod p runs on host numpy."""
    temp = _scaled_residues(x, bc)
    Li = temp[0].shape[-2]
    n = temp[0].shape[-1]
    batch = temp[0].shape[:-2]
    zeros = jnp.zeros(batch + (1, n), dtype=jnp.uint32)
    acc = tuple(zeros for _ in range(7))
    for j in range(Li):
        a = (temp[0][..., j:j + 1, :], temp[1][..., j:j + 1, :])
        r = tuple(arr[j:j + 1, :] for arr in bc.ibase_ratio_limbs)
        prod = limb.mul_limbs(a, r)
        acc = limb.add_limbs(acc, prod, out_len=7)
    half = (jnp.full_like(zeros, 0),) * 3 + (jnp.full_like(zeros, 0x80000000),) + (zeros,) * 3
    acc = limb.add_limbs(acc, half, out_len=7)
    v = (acc[4], acc[5])
    dot = _matrix_dot(temp, bc)
    p = bc.obase_mc
    v_q = limb.mul_mod(v, bc.q_mod_p, p.q, p.ratio0, p.ratio1)
    return dot, v_q


def exact_convert_array(x, bc: BaseConvDevice):
    """Exact conversion to a single-modulus obase with the CT-RSA 2019
    v-correction (parity: rns.cpp:465-539; integer fixed point instead of
    doubles — see module docstring). Returns [..., 1, N]."""
    temp = _scaled_residues(x, bc)
    Li = temp[0].shape[-2]
    # v = round(Σ_j x̂_j / q_j) via S = Σ_j x̂_j · ⌊2^128/q_j⌋, v = ⌊(S + 2^127)/2^128⌋
    n = temp[0].shape[-1]
    batch = temp[0].shape[:-2]
    zeros = jnp.zeros(batch + (1, n), dtype=jnp.uint32)
    acc = tuple(zeros for _ in range(7))  # 224-bit accumulator
    for j in range(Li):
        a = (temp[0][..., j:j + 1, :], temp[1][..., j:j + 1, :])
        r = tuple(arr[j:j + 1, :] for arr in bc.ibase_ratio_limbs)   # [1, 1] x5
        prod = limb.mul_limbs(a, r)                                  # 7 limbs
        acc = limb.add_limbs(acc, prod, out_len=7)
    half = (jnp.full_like(zeros, 0),) * 3 + (jnp.full_like(zeros, 0x80000000),) + (zeros,) * 3
    acc = limb.add_limbs(acc, half, out_len=7)
    v = (acc[4], acc[5])  # bits 128..191: v < 2^64 (indeed v <= Li)
    dot = _matrix_dot(temp, bc)
    p = bc.obase_mc
    v_q = limb.mul_mod(v, bc.q_mod_p, p.q, p.ratio0, p.ratio1)
    return limb.sub_mod(dot, v_q, p.q)


# ---------------------------------------------------------------------------
# Host + device: RNSTool
# ---------------------------------------------------------------------------

class RNSToolHost:
    """All RNSTool constants, computed exactly on host
    (parity: RNSTool::initialize, rns.cpp:578-787)."""

    def __init__(self, poly_modulus_degree: int, q: RNSBase, t: int = 0):
        if not (COEFF_MOD_COUNT_MIN <= q.size <= COEFF_MOD_COUNT_MAX):
            raise ValueError("rnsbase is invalid")
        if numth.get_power_of_two(poly_modulus_degree) < 0:
            raise ValueError("poly_modulus_degree is invalid")
        self.n = poly_modulus_degree
        self.t = int(t)
        self.base_q = q

        # Auxiliary base sizing (rns.cpp:600-615)
        total_coeff_bit_count = q.base_prod.bit_length()
        base_B_size = q.size
        if 32 + self.t.bit_length() + total_coeff_bit_count >= \
                INTERNAL_MOD_BIT_COUNT * q.size + INTERNAL_MOD_BIT_COUNT:
            base_B_size += 1

        primes = numth.get_primes(2 * self.n, INTERNAL_MOD_BIT_COUNT, base_B_size + 2)
        self.m_sk = primes[0]
        self.gamma = primes[1]
        base_B_primes = primes[2:2 + base_B_size]
        self.m_tilde = 1 << 32

        self.base_B = RNSBase(base_B_primes)
        self.base_Bsk = self.base_B.extend(self.m_sk)
        self.base_Bsk_m_tilde = self.base_Bsk.extend(self.m_tilde)
        self.base_t_gamma = RNSBase([self.t, self.gamma]) if self.t else None

        # Scalar constants
        self.prod_B_mod_q = [self.base_B.base_prod % qi for qi in q.base]
        self.inv_prod_q_mod_Bsk = [
            numth.invert_uint_mod(q.base_prod % b, b) for b in self.base_Bsk.base
        ]
        self.inv_prod_B_mod_m_sk = numth.invert_uint_mod(
            self.base_B.base_prod % self.m_sk, self.m_sk
        )
        self.inv_m_tilde_mod_Bsk = [
            numth.invert_uint_mod(self.m_tilde % b, b) for b in self.base_Bsk.base
        ]
        self.neg_inv_prod_q_mod_m_tilde = (
            -numth.invert_uint_mod(q.base_prod % self.m_tilde, self.m_tilde)
        ) % self.m_tilde
        self.prod_q_mod_Bsk = [q.base_prod % b for b in self.base_Bsk.base]
        if self.t:
            self.inv_gamma_mod_t = numth.invert_uint_mod(self.gamma % self.t, self.t)
            self.prod_t_gamma_mod_q = [
                (self.t * self.gamma) % qi for qi in q.base
            ]
            self.neg_inv_q_mod_t_gamma = [
                (-numth.invert_uint_mod(q.base_prod % p, p)) % p
                for p in self.base_t_gamma.base
            ]
        self.inv_q_last_mod_q = [
            numth.invert_uint_mod(q.base[-1], qi) for qi in q.base[:-1]
        ]
        if self.t:
            self.inv_q_last_mod_t = numth.invert_uint_mod(q.base[-1] % self.t, self.t)
            self.q_last_mod_t = q.base[-1] % self.t


class RNSToolDevice(NamedTuple):
    """Device-resident RNSTool constants (one per context chain level)."""

    n: int                              # static
    q_mc: ModConsts                     # [Lq, 1]
    bsk_mc: ModConsts                   # [LBsk, 1]
    t_mc: Optional[ModConsts]           # [1, 1] (BFV/BGV)
    mtilde_mc: ModConsts                # [1, 1]
    # base converters
    conv_q_to_bsk: BaseConvDevice
    conv_q_to_mtilde: BaseConvDevice
    conv_b_to_q: BaseConvDevice
    conv_b_to_msk: BaseConvDevice
    conv_q_to_t_gamma: Optional[BaseConvDevice]
    conv_q_to_t: Optional[BaseConvDevice]
    # scalars, Shoup pairs where multiplied (all [L, 1] limb pairs)
    mtilde_mod_q_op: limb.U64Pair       # m_tilde mod q_i, for fastbconv_m_tilde
    mtilde_mod_q_qt: limb.U64Pair
    neg_inv_prod_q_mod_mtilde_op: limb.U64Pair
    neg_inv_prod_q_mod_mtilde_qt: limb.U64Pair
    prod_q_mod_bsk_op: limb.U64Pair
    prod_q_mod_bsk_qt: limb.U64Pair
    inv_mtilde_mod_bsk_op: limb.U64Pair
    inv_mtilde_mod_bsk_qt: limb.U64Pair
    inv_prod_q_mod_bsk_op: limb.U64Pair
    inv_prod_q_mod_bsk_qt: limb.U64Pair
    inv_prod_b_mod_msk_op: limb.U64Pair   # [1, 1]
    inv_prod_b_mod_msk_qt: limb.U64Pair
    prod_b_mod_q_op: limb.U64Pair          # [Lq, 1]
    prod_b_mod_q_qt: limb.U64Pair
    neg_prod_b_mod_q_op: limb.U64Pair
    neg_prod_b_mod_q_qt: limb.U64Pair
    msk_div_2: limb.U64Pair                # [1, 1]
    mtilde_div_2: limb.U64Pair             # [1, 1]
    msk_value: limb.U64Pair                # [1, 1]
    mtilde_value: limb.U64Pair             # [1, 1]
    # {t, gamma} decrypt constants (BFV)
    prod_t_gamma_mod_q_op: Optional[limb.U64Pair]   # [Lq, 1]
    prod_t_gamma_mod_q_qt: Optional[limb.U64Pair]
    neg_inv_q_mod_t_gamma_op: Optional[limb.U64Pair]  # [2, 1]
    neg_inv_q_mod_t_gamma_qt: Optional[limb.U64Pair]
    inv_gamma_mod_t_op: Optional[limb.U64Pair]      # [1, 1]
    inv_gamma_mod_t_qt: Optional[limb.U64Pair]
    gamma_div_2: Optional[limb.U64Pair]             # [1, 1]
    gamma_value: Optional[limb.U64Pair]             # [1, 1]
    # q_last division (modswitch/rescale)
    inv_q_last_mod_q_op: limb.U64Pair    # [Lq-1, 1]
    inv_q_last_mod_q_qt: limb.U64Pair
    q_last_half: limb.U64Pair            # [1, 1]
    half_mod_q_op: limb.U64Pair          # [Lq-1, 1]: (q_last/2) mod q_i
    q_last_value: limb.U64Pair           # [1, 1]
    # BGV constants
    inv_q_last_mod_t_op: Optional[limb.U64Pair]     # [1, 1]
    inv_q_last_mod_t_qt: Optional[limb.U64Pair]
    # NTT tables over Bsk (for the BEHZ multiply)
    bsk_ntt: ntt_mod.NTTDeviceTables


jax.tree_util.register_pytree_node(
    RNSToolDevice,
    lambda t: (tuple(t[1:]), t.n),
    lambda n, children: RNSToolDevice(n, *children),
)


def _sp(values, moduli, L):
    """Shoup pairs [L, 1] from host ints."""
    return shoup_pair([[int(v)] for v in values], [[int(m)] for m in moduli], shape=(L, 1))


def _val(v):
    return limb.arr_to_u64([[int(v)]], shape=(1, 1))


def make_rns_tool_device(host: RNSToolHost, log_n: int) -> RNSToolDevice:
    q = host.base_q
    bsk = host.base_Bsk
    Lq, LBsk = q.size, bsk.size
    has_t = bool(host.t)

    mtilde_mod_q = [host.m_tilde % qi for qi in q.base]
    half = q.base[-1] >> 1
    half_mod = [half % qi for qi in q.base[:-1]]

    def opt(x):
        return x if has_t else None

    return RNSToolDevice(
        n=host.n,
        q_mc=make_mod_consts(q.base),
        bsk_mc=make_mod_consts(bsk.base),
        t_mc=opt(make_mod_consts([host.t])) if has_t else None,
        mtilde_mc=make_mod_consts([host.m_tilde]),
        conv_q_to_bsk=make_base_conv(q, bsk),
        conv_q_to_mtilde=make_base_conv(q, RNSBase([host.m_tilde])),
        conv_b_to_q=make_base_conv(host.base_B, q),
        conv_b_to_msk=make_base_conv(host.base_B, RNSBase([host.m_sk])),
        conv_q_to_t_gamma=make_base_conv(q, host.base_t_gamma) if has_t else None,
        conv_q_to_t=make_base_conv(q, RNSBase([host.t])) if has_t else None,
        mtilde_mod_q_op=_sp(mtilde_mod_q, q.base, Lq)[0],
        mtilde_mod_q_qt=_sp(mtilde_mod_q, q.base, Lq)[1],
        neg_inv_prod_q_mod_mtilde_op=_sp([host.neg_inv_prod_q_mod_m_tilde], [host.m_tilde], 1)[0],
        neg_inv_prod_q_mod_mtilde_qt=_sp([host.neg_inv_prod_q_mod_m_tilde], [host.m_tilde], 1)[1],
        prod_q_mod_bsk_op=_sp(host.prod_q_mod_Bsk, bsk.base, LBsk)[0],
        prod_q_mod_bsk_qt=_sp(host.prod_q_mod_Bsk, bsk.base, LBsk)[1],
        inv_mtilde_mod_bsk_op=_sp(host.inv_m_tilde_mod_Bsk, bsk.base, LBsk)[0],
        inv_mtilde_mod_bsk_qt=_sp(host.inv_m_tilde_mod_Bsk, bsk.base, LBsk)[1],
        inv_prod_q_mod_bsk_op=_sp(host.inv_prod_q_mod_Bsk, bsk.base, LBsk)[0],
        inv_prod_q_mod_bsk_qt=_sp(host.inv_prod_q_mod_Bsk, bsk.base, LBsk)[1],
        inv_prod_b_mod_msk_op=_sp([host.inv_prod_B_mod_m_sk], [host.m_sk], 1)[0],
        inv_prod_b_mod_msk_qt=_sp([host.inv_prod_B_mod_m_sk], [host.m_sk], 1)[1],
        prod_b_mod_q_op=_sp(host.prod_B_mod_q, q.base, Lq)[0],
        prod_b_mod_q_qt=_sp(host.prod_B_mod_q, q.base, Lq)[1],
        neg_prod_b_mod_q_op=_sp(
            [(qi - p) % qi for p, qi in zip(host.prod_B_mod_q, q.base)], q.base, Lq
        )[0],
        neg_prod_b_mod_q_qt=_sp(
            [(qi - p) % qi for p, qi in zip(host.prod_B_mod_q, q.base)], q.base, Lq
        )[1],
        msk_div_2=_val(host.m_sk >> 1),
        mtilde_div_2=_val(host.m_tilde >> 1),
        msk_value=_val(host.m_sk),
        mtilde_value=_val(host.m_tilde),
        prod_t_gamma_mod_q_op=opt(_sp(host.prod_t_gamma_mod_q, q.base, Lq)[0] if has_t else None),
        prod_t_gamma_mod_q_qt=opt(_sp(host.prod_t_gamma_mod_q, q.base, Lq)[1] if has_t else None),
        neg_inv_q_mod_t_gamma_op=opt(
            _sp(host.neg_inv_q_mod_t_gamma, host.base_t_gamma.base, 2)[0] if has_t else None),
        neg_inv_q_mod_t_gamma_qt=opt(
            _sp(host.neg_inv_q_mod_t_gamma, host.base_t_gamma.base, 2)[1] if has_t else None),
        inv_gamma_mod_t_op=opt(_sp([host.inv_gamma_mod_t], [host.t], 1)[0] if has_t else None),
        inv_gamma_mod_t_qt=opt(_sp([host.inv_gamma_mod_t], [host.t], 1)[1] if has_t else None),
        gamma_div_2=opt(_val(host.gamma >> 1) if has_t else None),
        gamma_value=opt(_val(host.gamma) if has_t else None),
        inv_q_last_mod_q_op=_sp(host.inv_q_last_mod_q, q.base[:-1], Lq - 1)[0],
        inv_q_last_mod_q_qt=_sp(host.inv_q_last_mod_q, q.base[:-1], Lq - 1)[1],
        q_last_half=_val(half),
        half_mod_q_op=limb.arr_to_u64([[v] for v in half_mod], shape=(Lq - 1, 1)),
        q_last_value=_val(q.base[-1]),
        inv_q_last_mod_t_op=opt(_sp([host.inv_q_last_mod_t], [host.t], 1)[0] if has_t else None),
        inv_q_last_mod_t_qt=opt(_sp([host.inv_q_last_mod_t], [host.t], 1)[1] if has_t else None),
        bsk_ntt=ntt_mod.build_device_tables(log_n, bsk.base),
    )


# ---------------------------------------------------------------------------
# Device RNSTool ops. x tensors are u64 pairs shaped [..., L, N].
# ---------------------------------------------------------------------------

def fastbconv_m_tilde(x, rt: RNSToolDevice):
    """q -> Bsk ∪ {m̃}: multiply by m̃ mod q then fast-convert
    (parity: rns.cpp:1086-1131). [..., Lq, N] -> [..., LBsk+1, N]."""
    temp = limb.mul_mod_shoup(x, rt.mtilde_mod_q_op, rt.mtilde_mod_q_qt, rt.q_mc.q)
    to_bsk = fast_convert_array(temp, rt.conv_q_to_bsk)
    to_mtilde = fast_convert_array(temp, rt.conv_q_to_mtilde)
    return (
        jnp.concatenate([to_bsk[0], to_mtilde[0]], axis=-2),
        jnp.concatenate([to_bsk[1], to_mtilde[1]], axis=-2),
    )


def sm_mrq(x, rt: RNSToolDevice):
    """Montgomery reduction mod m̃: Bsk ∪ {m̃} -> Bsk
    (parity: rns.cpp:979-1039). [..., LBsk+1, N] -> [..., LBsk, N]."""
    LBsk = rt.bsk_mc.count
    x_bsk = (x[0][..., :LBsk, :], x[1][..., :LBsk, :])
    x_mt = (x[0][..., LBsk:, :], x[1][..., LBsk:, :])
    r_mt = limb.mul_mod_shoup(
        x_mt, rt.neg_inv_prod_q_mod_mtilde_op, rt.neg_inv_prod_q_mod_mtilde_qt,
        rt.mtilde_mc.q,
    )
    # centered reduction: r >= m̃/2 ? r + (q_i - m̃) : r   (any u64 is fine)
    need = limb.ge64(r_mt, rt.mtilde_div_2)
    shift = limb.sub64(rt.bsk_mc.q, rt.mtilde_value)
    r_c = limb.select64(need, limb.add64(r_mt, shift), r_mt)
    summed = limb.multiply_add_mod_shoup(
        r_c, rt.prod_q_mod_bsk_op, rt.prod_q_mod_bsk_qt, x_bsk, rt.bsk_mc.q
    )
    return limb.mul_mod_shoup(
        summed, rt.inv_mtilde_mod_bsk_op, rt.inv_mtilde_mod_bsk_qt, rt.bsk_mc.q
    )


def fast_floor(x, rt: RNSToolDevice):
    """⌊x/q⌋ in Bsk: q ∪ Bsk -> Bsk (parity: rns.cpp:1041-1084).
    [..., Lq+LBsk, N] -> [..., LBsk, N]."""
    Lq = rt.q_mc.count
    x_q = (x[0][..., :Lq, :], x[1][..., :Lq, :])
    x_bsk = (x[0][..., Lq:, :], x[1][..., Lq:, :])
    conv = fast_convert_array(x_q, rt.conv_q_to_bsk)
    diff = limb.sub64(limb.add64(x_bsk, rt.bsk_mc.q), conv)  # < 2q, lazy ok
    return limb.mul_mod_shoup(
        diff, rt.inv_prod_q_mod_bsk_op, rt.inv_prod_q_mod_bsk_qt, rt.bsk_mc.q
    )


def fastbconv_sk(x, rt: RNSToolDevice):
    """Shenoy-Kumaresan Bsk -> q (parity: rns.cpp:903-977).
    [..., LBsk, N] -> [..., Lq, N]."""
    LB = rt.bsk_mc.count - 1
    x_b = (x[0][..., :LB, :], x[1][..., :LB, :])
    x_sk = (x[0][..., LB:, :], x[1][..., LB:, :])
    dest = fast_convert_array(x_b, rt.conv_b_to_q)
    temp = fast_convert_array(x_b, rt.conv_b_to_msk)
    alpha = limb.mul_mod_shoup(
        limb.sub64(limb.add64(temp, rt.msk_value), x_sk),
        rt.inv_prod_b_mod_msk_op, rt.inv_prod_b_mod_msk_qt, rt.msk_value,
    )
    # alpha encodes a centered value: correct when alpha > m_sk/2 (strict)
    big = limb.lt64(rt.msk_div_2, alpha)
    arg = limb.select64(big, limb.neg_mod(alpha, rt.msk_value), alpha)
    op = limb.select64(big, rt.prod_b_mod_q_op, rt.neg_prod_b_mod_q_op)
    qt = limb.select64(big, rt.prod_b_mod_q_qt, rt.neg_prod_b_mod_q_qt)
    return limb.multiply_add_mod_shoup(arg, op, qt, dest, rt.q_mc.q)


def _split_last(x, L):
    """Split [..., L, N] into ([..., L-1, N], [..., 1, N])."""
    return (
        (x[0][..., :L - 1, :], x[1][..., :L - 1, :]),
        (x[0][..., L - 1:, :], x[1][..., L - 1:, :]),
    )


def _last_mc(mc: ModConsts) -> ModConsts:
    L = mc.count
    return ModConsts(*(tuple(a[L - 1:] for a in field) for field in mc))


def divide_and_round_q_last(x, rt: RNSToolDevice):
    """Rescale by the last prime, coefficient domain
    (parity: rns.cpp:789-828). [..., Lq, N] -> [..., Lq-1, N]."""
    Lq = rt.q_mc.count
    keep_mc = rt.q_mc.slice_levels(Lq - 1)
    x_keep, x_last = _split_last(x, Lq)
    # add q_last/2 to turn flooring into rounding
    last = limb.add_mod(x_last, rt.q_last_half, _last_mc(rt.q_mc).q)
    # temp = (last mod q_i) - (q_last/2 mod q_i), then x_i - temp, x inv(q_last)
    temp = limb.barrett_reduce_64(last, keep_mc.q, keep_mc.ratio1)
    temp = limb.sub_mod(temp, rt.half_mod_q_op, keep_mc.q)
    diff = limb.sub_mod(x_keep, temp, keep_mc.q)
    return limb.mul_mod_shoup(diff, rt.inv_q_last_mod_q_op, rt.inv_q_last_mod_q_qt, keep_mc.q)


def divide_and_round_q_last_ntt(x, rt: RNSToolDevice, ntt_tables: ntt_mod.NTTDeviceTables):
    """Rescale by the last prime, NTT domain (parity: rns.cpp:830-901).
    x: [..., Lq, N] in NTT form; ntt_tables covers the full q tower.
    Returns [..., Lq-1, N] in NTT form."""
    Lq = rt.q_mc.count
    keep_mc = rt.q_mc.slice_levels(Lq - 1)
    x_keep, x_last = _split_last(x, Lq)
    last_tables = ntt_mod.slice_tables(ntt_tables, Lq - 1, Lq)
    keep_tables = ntt_mod.slice_tables(ntt_tables, 0, Lq - 1)
    last = ntt_mod.ntt_inverse(x_last, last_tables)
    last = limb.add_mod(last, rt.q_last_half, _last_mc(rt.q_mc).q)
    # temp = last mod q_i (skippable when q_i > q_last, kept unconditionally
    # — same value either way since barrett is exact)
    temp = limb.barrett_reduce_64(last, keep_mc.q, keep_mc.ratio1)
    # lazy add of q_i - (half mod q_i), input to lazy NTT < 2q_i
    neg_half = limb.sub64(keep_mc.q, rt.half_mod_q_op)
    temp = limb.add64(temp, neg_half)
    temp = ntt_mod.ntt_forward(temp, keep_tables, lazy=True)  # < 4q_i
    # x_i + 4q_i - temp, then Shoup-reduce via the scalar multiply
    qi_lazy = limb.shl64(keep_mc.q, 2)
    diff = limb.sub64(limb.add64(x_keep, qi_lazy), temp)
    return limb.mul_mod_shoup(diff, rt.inv_q_last_mod_q_op, rt.inv_q_last_mod_q_qt, keep_mc.q)


def mod_t_and_divide_q_last(x, rt: RNSToolDevice):
    """BGV modswitch: exact division by q_last after adding a multiple of t
    (parity: rns.cpp:1203-1240). [..., Lq, N] -> [..., Lq-1, N]."""
    Lq = rt.q_mc.count
    keep_mc = rt.q_mc.slice_levels(Lq - 1)
    x_keep, x_last = _split_last(x, Lq)
    t = rt.t_mc
    # neg_c_last_mod_t = -(c_last mod t) * q_last^{-1} mod t
    neg_c = limb.neg_mod(limb.barrett_reduce_64(x_last, t.q, t.ratio1), t.q)
    neg_c = limb.mul_mod_shoup(neg_c, rt.inv_q_last_mod_t_op, rt.inv_q_last_mod_t_qt, t.q)
    # delta_i = (neg_c mod q_i) * q_last mod q_i
    delta = limb.barrett_reduce_64(neg_c, keep_mc.q, keep_mc.ratio1)
    delta = limb.mul_mod(delta, rt.q_last_value, keep_mc.q, keep_mc.ratio0, keep_mc.ratio1)
    # c_i += 2q_i - (c_last mod q_i) - delta, then * q_last^{-1} mod q_i
    c_last_mod = limb.barrett_reduce_64(x_last, keep_mc.q, keep_mc.ratio1)
    acc = limb.add64(x_keep, limb.sub64(limb.sub64(keep_mc.two_q, c_last_mod), delta))
    return limb.mul_mod_shoup(acc, rt.inv_q_last_mod_q_op, rt.inv_q_last_mod_q_qt, keep_mc.q)


def decrypt_scale_and_round(x, rt: RNSToolDevice):
    """BFV decryption rounding via the {t, γ} base
    (parity: rns.cpp:1133-1201). [..., Lq, N] -> [..., 1, N] mod t."""
    t = rt.t_mc
    temp = limb.mul_mod_shoup(x, rt.prod_t_gamma_mod_q_op, rt.prod_t_gamma_mod_q_qt, rt.q_mc.q)
    tg = fast_convert_array(temp, rt.conv_q_to_t_gamma)
    tg_mc = rt.conv_q_to_t_gamma.obase_mc
    tg = limb.mul_mod_shoup(tg, rt.neg_inv_q_mod_t_gamma_op, rt.neg_inv_q_mod_t_gamma_qt, tg_mc.q)
    t_part = (tg[0][..., 0:1, :], tg[1][..., 0:1, :])
    g_part = (tg[0][..., 1:2, :], tg[1][..., 1:2, :])
    # centered-mod correction on the gamma component
    over = limb.lt64(rt.gamma_div_2, g_part)
    corr_pos = limb.add_mod(
        t_part, limb.barrett_reduce_64(limb.sub64(rt.gamma_value, g_part), t.q, t.ratio1), t.q
    )
    corr_neg = limb.sub_mod(
        t_part, limb.barrett_reduce_64(g_part, t.q, t.ratio1), t.q
    )
    dest = limb.select64(over, corr_pos, corr_neg)
    return limb.mul_mod_shoup(dest, rt.inv_gamma_mod_t_op, rt.inv_gamma_mod_t_qt, t.q)


def decrypt_modt(x, rt: RNSToolDevice):
    """BGV decryption: exact conversion q -> {t} (parity: rns.cpp:1242-1246)."""
    return exact_convert_array(x, rt.conv_q_to_t)
