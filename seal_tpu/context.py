"""SEALContext: parameter validation + per-level precomputation registry.

Parity: seal::SEALContext / ContextData (/root/reference/native/src/seal/
context.{h,cpp}:28-679 — qualifiers, validate(), the modulus-switching chain
of ContextData keyed by parms_id, chain_index assignment).

TPU design: each ContextData owns lazily-built *device-resident* constant
bundles (NTT tables over the level's tower, the RNSTool tensors, BFV Δ in
RNS with Shoup pairs). Evaluator ops fetch these bundles and jit over them;
one compiled function is reused across contexts with identical shapes.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass
from typing import Optional

from seal_tpu.encryption_params import EncryptionParameters, ParmsId, SchemeType, PARMS_ID_ZERO
from seal_tpu.modulus import (
    CoeffModulus,
    Modulus,
    SecLevelType,
    COEFF_MOD_COUNT_MAX,
    COEFF_MOD_COUNT_MIN,
    POLY_MOD_DEGREE_MAX,
    POLY_MOD_DEGREE_MIN,
    USER_MOD_BIT_COUNT_MAX,
    USER_MOD_BIT_COUNT_MIN,
)
from seal_tpu.utils import numth


class ErrorType(enum.Enum):
    """Qualifier verdicts (parity: context.h:34-115 error_type)."""

    NONE = "none"
    SUCCESS = "success"
    INVALID_SCHEME = "invalid_scheme"
    INVALID_COEFF_MODULUS_SIZE = "invalid_coeff_modulus_size"
    INVALID_COEFF_MODULUS_BIT_COUNT = "invalid_coeff_modulus_bit_count"
    INVALID_COEFF_MODULUS_NO_NTT = "invalid_coeff_modulus_no_ntt"
    INVALID_POLY_MODULUS_DEGREE = "invalid_poly_modulus_degree"
    INVALID_POLY_MODULUS_DEGREE_NON_POWER_OF_TWO = "invalid_poly_modulus_degree_non_power_of_two"
    INVALID_PARAMETERS_TOO_LARGE = "invalid_parameters_too_large"
    INVALID_PARAMETERS_INSECURE = "invalid_parameters_insecure"
    FAILED_CREATING_RNS_BASE = "failed_creating_rns_base"
    INVALID_PLAIN_MODULUS_BIT_COUNT = "invalid_plain_modulus_bit_count"
    INVALID_PLAIN_MODULUS_COPRIMALITY = "invalid_plain_modulus_coprimality"
    INVALID_PLAIN_MODULUS_TOO_LARGE = "invalid_plain_modulus_too_large"
    INVALID_PLAIN_MODULUS_NONZERO = "invalid_plain_modulus_nonzero"
    FAILED_CREATING_RNS_TOOL = "failed_creating_rns_tool"


# parity: context.cpp:78-133 parameter_error_message
_ERROR_MESSAGES = {
    ErrorType.NONE: "constructed but not yet validated",
    ErrorType.SUCCESS: "valid",
    ErrorType.INVALID_SCHEME: "scheme must be BFV or CKKS or BGV",
    ErrorType.INVALID_COEFF_MODULUS_SIZE:
        "coeff_modulus's primes' count is not bounded by "
        "SEAL_COEFF_MOD_COUNT_MIN(MAX)",
    ErrorType.INVALID_COEFF_MODULUS_BIT_COUNT:
        "coeff_modulus's primes' bit counts are not bounded by "
        "SEAL_USER_MOD_BIT_COUNT_MIN(MAX)",
    ErrorType.INVALID_COEFF_MODULUS_NO_NTT:
        "coeff_modulus's primes are not congruent to 1 modulo "
        "(2 * poly_modulus_degree)",
    ErrorType.INVALID_POLY_MODULUS_DEGREE:
        "poly_modulus_degree is not bounded by SEAL_POLY_MOD_DEGREE_MIN(MAX)",
    ErrorType.INVALID_POLY_MODULUS_DEGREE_NON_POWER_OF_TWO:
        "poly_modulus_degree is not a power of two",
    ErrorType.INVALID_PARAMETERS_TOO_LARGE:
        "parameters are too large to fit in size_t type",
    ErrorType.INVALID_PARAMETERS_INSECURE:
        "parameters are not compliant with HomomorphicEncryption.org "
        "security standard",
    ErrorType.FAILED_CREATING_RNS_BASE: "RNSBase cannot be constructed",
    ErrorType.INVALID_PLAIN_MODULUS_BIT_COUNT:
        "plain_modulus's bit count is not bounded by "
        "SEAL_PLAIN_MOD_BIT_COUNT_MIN(MAX)",
    ErrorType.INVALID_PLAIN_MODULUS_COPRIMALITY:
        "plain_modulus is not coprime to coeff_modulus",
    ErrorType.INVALID_PLAIN_MODULUS_TOO_LARGE:
        "plain_modulus is not smaller than coeff_modulus",
    ErrorType.INVALID_PLAIN_MODULUS_NONZERO: "plain_modulus is not zero",
    ErrorType.FAILED_CREATING_RNS_TOOL: "RNSTool cannot be constructed",
}


@dataclass
class EncryptionParameterQualifiers:
    """Validation verdict + feature flags (parity: context.h:28-209)."""

    parameter_error: ErrorType = ErrorType.NONE
    using_fft: bool = False
    using_ntt: bool = False
    using_batching: bool = False
    using_fast_plain_lift: bool = False
    using_descending_modulus_chain: bool = False
    sec_level: SecLevelType = SecLevelType.NONE

    @property
    def parameters_set(self) -> bool:
        return self.parameter_error == ErrorType.SUCCESS

    @property
    def parameter_error_message(self) -> str:
        """Human-readable diagnosis (parity: context.cpp:78
        parameter_error_message)."""
        return _ERROR_MESSAGES.get(self.parameter_error,
                                   "invalid parameter_error")

    @property
    def parameter_error_name(self) -> str:
        """Short error identifier (parity: context.cpp:21
        parameter_error_name — the enum's snake-case name)."""
        return self.parameter_error.name.lower()


class ContextData:
    """Precomputations for one level of the modulus-switching chain."""

    def __init__(self, parms: EncryptionParameters):
        self.parms = parms
        self.qualifiers = EncryptionParameterQualifiers()
        self.total_coeff_modulus: int = 0
        self.total_coeff_modulus_bit_count: int = 0
        self.rns_base = None                 # ops.rns.RNSBase
        self.rns_tool_host = None            # ops.rns.RNSToolHost
        self.chain_index: int = 0
        self.prev_context_data: Optional["ContextData"] = None
        self.next_context_data: Optional["ContextData"] = None
        # BFV/BGV plain-related constants
        self.coeff_div_plain_modulus: Optional[list[int]] = None   # Δ in RNS
        self.coeff_modulus_mod_plain_modulus: int = 0
        self.upper_half_increment: Optional[list[int]] = None
        self.plain_upper_half_threshold: int = 0
        self.plain_upper_half_increment: Optional[list[int]] = None
        # CKKS
        self.upper_half_threshold: Optional[int] = None
        self._device_cache: dict = {}

    # -- identity ------------------------------------------------------------

    @property
    def parms_id(self) -> ParmsId:
        return self.parms.parms_id

    def key_moduli(self):
        return [m.value for m in self.parms.coeff_modulus]

    @property
    def coeff_modulus_size(self) -> int:
        return len(self.parms.coeff_modulus)

    @property
    def log_n(self) -> int:
        return numth.get_power_of_two(self.parms.poly_modulus_degree)

    # -- lazily-built device bundles ------------------------------------------

    def _cached(self, key, builder):
        if key not in self._device_cache:
            # Build OUTSIDE any active jit trace: these bundles are cached on
            # the context, and a value created while tracing would be a
            # tracer leaking across traces. ensure_compile_time_eval makes
            # first-touch-inside-jit safe.
            import jax

            with jax.ensure_compile_time_eval():
                self._device_cache[key] = builder()
        return self._device_cache[key]

    def _ntt_cached(self, key, moduli):
        """Base tables cached on first touch (no Pallas on CPU backends —
        keeps fresh-process host keygen off the pallas import); the fused
        tables attach on first access under a TPU backend."""
        import jax

        from seal_tpu.ops import ntt as ntt_mod

        t = self._cached(
            key, lambda: ntt_mod.build_device_tables(self.log_n, moduli))
        if t.pallas is None:
            with jax.ensure_compile_time_eval():
                t2 = ntt_mod.attach_pallas_tables(t, moduli)
            if t2 is not t:
                self._device_cache[key] = t2
                t = t2
        return t

    @property
    def ntt_tables(self):
        """Device NTT tables over this level's coeff tower [L, n]."""
        return self._ntt_cached("ntt", self.key_moduli())

    @property
    def plain_ntt_tables(self):
        return self._ntt_cached("plain_ntt", [self.parms.plain_modulus.value])

    @property
    def mod_consts(self):
        from seal_tpu.ops.modring import make_mod_consts

        return self._cached("mc", lambda: make_mod_consts(self.key_moduli()))

    @property
    def rns_tool_device(self):
        from seal_tpu.ops import rns as rns_mod

        return self._cached(
            "rns_tool", lambda: rns_mod.make_rns_tool_device(self.rns_tool_host, self.log_n)
        )

    @property
    def galois_tool(self):
        from seal_tpu.ops.galois import GaloisTool

        return self._cached("galois", lambda: GaloisTool(self.log_n))


class SEALContext:
    """Validates parameters and owns the modulus-switching chain
    (parity: context.cpp:422-525)."""

    def __init__(
        self,
        parms: EncryptionParameters,
        expand_mod_chain: bool = True,
        sec_level: SecLevelType = SecLevelType.TC128,
    ):
        self.sec_level = sec_level
        self._context_data_map: dict[ParmsId, ContextData] = {}

        key_cd = self._validate(parms.clone())
        self._context_data_map[parms.parms_id] = key_cd
        self.key_parms_id = parms.parms_id

        alpha = parms.special_modulus_size
        if (not key_cd.qualifiers.parameters_set
                or len(parms.coeff_modulus) <= alpha):
            self.first_parms_id = self.key_parms_id
        else:
            # hybrid keyswitching (alpha > 1): the key level reserves alpha
            # special primes, so the first DATA level drops all of them at
            # once (the reference's alpha=1 chain drops one: context.cpp:498)
            next_id = self._create_next_context_data(self.key_parms_id, drop=alpha)
            self.first_parms_id = self.key_parms_id if next_id == PARMS_ID_ZERO else next_id

        self.last_parms_id = self.first_parms_id
        self.using_keyswitching = self.first_parms_id != self.key_parms_id

        if expand_mod_chain and self._context_data_map[self.first_parms_id].qualifiers.parameters_set:
            prev_id = self.first_parms_id
            while len(self._context_data_map[prev_id].parms.coeff_modulus) > 1:
                next_id = self._create_next_context_data(prev_id)
                if next_id == PARMS_ID_ZERO:
                    break
                prev_id = next_id
                self.last_parms_id = next_id

        # chain_index: key level gets the highest index
        count = len(self._context_data_map)
        cd = self._context_data_map[self.key_parms_id]
        while cd is not None:
            count -= 1
            cd.chain_index = count
            cd = cd.next_context_data

    # -- lookups ---------------------------------------------------------------

    def get_context_data(self, parms_id: ParmsId) -> Optional[ContextData]:
        return self._context_data_map.get(tuple(parms_id))

    def key_context_data(self) -> ContextData:
        return self._context_data_map[self.key_parms_id]

    def first_context_data(self) -> ContextData:
        return self._context_data_map[self.first_parms_id]

    def last_context_data(self) -> ContextData:
        return self._context_data_map[self.last_parms_id]

    @property
    def parameters_set(self) -> bool:
        return self.first_context_data().qualifiers.parameters_set

    def parameter_error_message(self) -> str:
        return self.first_context_data().qualifiers.parameter_error_message

    def parameter_error_name(self) -> str:
        """Parity: context.h:581 parameter_error_name."""
        return self.first_context_data().qualifiers.parameter_error_name

    # -- construction -----------------------------------------------------------

    def _create_next_context_data(self, prev_id: ParmsId, drop: int = 1) -> ParmsId:
        next_parms = self._context_data_map[prev_id].parms.clone()
        moduli = next_parms.coeff_modulus
        next_parms.set_coeff_modulus(moduli[:-drop])
        next_id = next_parms.parms_id

        next_cd = self._validate(next_parms)
        if not next_cd.qualifiers.parameters_set:
            return PARMS_ID_ZERO

        self._context_data_map[next_id] = next_cd
        self._context_data_map[prev_id].next_context_data = next_cd
        next_cd.prev_context_data = self._context_data_map[prev_id]
        return next_id

    def _validate(self, parms: EncryptionParameters) -> ContextData:
        """Parameter validation + host precomputations
        (parity: context.cpp:135-420)."""
        from seal_tpu.ops import rns as rns_mod

        cd = ContextData(parms)
        q = cd.qualifiers
        q.parameter_error = ErrorType.SUCCESS

        if parms.scheme == SchemeType.NONE:
            q.parameter_error = ErrorType.INVALID_SCHEME
            return cd

        coeff_modulus = parms.coeff_modulus
        plain_modulus = parms.plain_modulus

        if not (COEFF_MOD_COUNT_MIN <= len(coeff_modulus) <= COEFF_MOD_COUNT_MAX):
            q.parameter_error = ErrorType.INVALID_COEFF_MODULUS_SIZE
            return cd
        for m in coeff_modulus:
            if m.value >> USER_MOD_BIT_COUNT_MAX or not (m.value >> (USER_MOD_BIT_COUNT_MIN - 1)):
                q.parameter_error = ErrorType.INVALID_COEFF_MODULUS_BIT_COUNT
                return cd

        cd.total_coeff_modulus = numth.multiply_many([m.value for m in coeff_modulus])
        cd.total_coeff_modulus_bit_count = cd.total_coeff_modulus.bit_length()

        n = parms.poly_modulus_degree
        if not (POLY_MOD_DEGREE_MIN <= n <= POLY_MOD_DEGREE_MAX):
            q.parameter_error = ErrorType.INVALID_POLY_MODULUS_DEGREE
            return cd
        if numth.get_power_of_two(n) < 0:
            q.parameter_error = ErrorType.INVALID_POLY_MODULUS_DEGREE_NON_POWER_OF_TWO
            return cd

        q.using_fft = True
        q.sec_level = self.sec_level
        if cd.total_coeff_modulus_bit_count > CoeffModulus.max_bit_count(n, self.sec_level):
            q.sec_level = SecLevelType.NONE
            if self.sec_level != SecLevelType.NONE:
                q.parameter_error = ErrorType.INVALID_PARAMETERS_INSECURE
                return cd

        try:
            cd.rns_base = rns_mod.RNSBase([m.value for m in coeff_modulus])
        except ValueError:
            q.parameter_error = ErrorType.FAILED_CREATING_RNS_BASE
            return cd

        # NTT support: every prime must be ≡ 1 mod 2n with a primitive root
        q.using_ntt = True
        for m in coeff_modulus:
            if numth.try_minimal_primitive_root(2 * n, m.value) is None:
                q.using_ntt = False
                q.parameter_error = ErrorType.INVALID_COEFF_MODULUS_NO_NTT
                return cd

        if parms.scheme in (SchemeType.BFV, SchemeType.BGV):
            t = plain_modulus.value
            if t >> USER_MOD_BIT_COUNT_MAX or not (t >> (USER_MOD_BIT_COUNT_MIN - 1)):
                q.parameter_error = ErrorType.INVALID_PLAIN_MODULUS_BIT_COUNT
                return cd
            for m in coeff_modulus:
                if not numth.are_coprime(m.value, t):
                    q.parameter_error = ErrorType.INVALID_PLAIN_MODULUS_COPRIMALITY
                    return cd
            if t >= cd.total_coeff_modulus:
                q.parameter_error = ErrorType.INVALID_PLAIN_MODULUS_TOO_LARGE
                return cd

            q.using_batching = numth.try_minimal_primitive_root(2 * n, t) is not None
            q.using_fast_plain_lift = all(m.value > t for m in coeff_modulus)

            # BFV Δ = floor(Q/t) in RNS + the remainder (upper_half_increment)
            delta, rem = divmod(cd.total_coeff_modulus, t)
            cd.coeff_div_plain_modulus = cd.rns_base.decompose(delta)
            cd.coeff_modulus_mod_plain_modulus = rem  # Q mod t (< t)
            cd.upper_half_increment = cd.rns_base.decompose(rem)
            cd.plain_upper_half_threshold = (t + 1) >> 1
            if q.using_fast_plain_lift:
                cd.plain_upper_half_increment = [m.value - t for m in coeff_modulus]
            else:
                # stored as the RNS decomposition of Q - t
                cd.plain_upper_half_increment = cd.rns_base.decompose(
                    cd.total_coeff_modulus - t
                )
        elif parms.scheme == SchemeType.CKKS:
            if plain_modulus.value != 0:
                q.parameter_error = ErrorType.INVALID_PLAIN_MODULUS_NONZERO
                return cd
            q.using_batching = True
            q.using_fast_plain_lift = False
            cd.plain_upper_half_threshold = 1 << 63
            # 2^64 mod q_i, computed as (2^63 mod q_i)*(q_i-2) mod q_i
            cd.plain_upper_half_increment = [
                ((1 << 63) % m.value) * (m.value - 2) % m.value for m in coeff_modulus
            ]
            cd.upper_half_threshold = (cd.total_coeff_modulus + 1) >> 1
        else:
            q.parameter_error = ErrorType.INVALID_SCHEME
            return cd

        try:
            cd.rns_tool_host = rns_mod.RNSToolHost(
                n, cd.rns_base, plain_modulus.value if parms.scheme != SchemeType.CKKS else 0
            )
        except (ValueError, RuntimeError):
            q.parameter_error = ErrorType.FAILED_CREATING_RNS_TOOL
            return cd

        q.using_descending_modulus_chain = all(
            coeff_modulus[i].value > coeff_modulus[i + 1].value
            for i in range(len(coeff_modulus) - 1)
        )
        return cd

    def __repr__(self):
        levels = []
        cd = self.key_context_data()
        while cd is not None:
            levels.append(cd.coeff_modulus_size)
            cd = cd.next_context_data
        return f"SEALContext(levels={levels}, set={self.parameters_set})"
