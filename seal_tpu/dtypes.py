"""Scheme data types: Plaintext, Ciphertext, keys.

Parity: seal::{Plaintext, Ciphertext, SecretKey, PublicKey, KSwitchKeys,
RelinKeys, GaloisKeys} (/root/reference/native/src/seal/*.h). The reference
stores flat uint64 DynArrays; here the canonical storage is a device-resident
u32 limb-pair tensor (lo, hi) — `[size, L, N]` for ciphertexts — with
numpy-uint64 host mirrors only at serialization/sampling boundaries.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from seal_tpu.encryption_params import ParmsId, PARMS_ID_ZERO


# ---------------------------------------------------------------------------
# host numpy <-> device limb pair
# ---------------------------------------------------------------------------

def _native_lib():
    from seal_tpu import native

    lib = native.get_lib()
    return lib if lib is not None and hasattr(lib, "sealtpu_split_u32") else None


def to_device(arr: np.ndarray):
    """uint64 ndarray -> (lo, hi) uint32 device pair."""
    import ctypes

    arr = np.ascontiguousarray(arr, dtype=np.uint64)
    lib = _native_lib()
    if lib is not None:
        lo = np.empty(arr.shape, dtype=np.uint32)
        hi = np.empty(arr.shape, dtype=np.uint32)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        lib.sealtpu_split_u32(
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), arr.size,
            lo.ctypes.data_as(u32p), hi.ctypes.data_as(u32p))
    else:
        lo = (arr & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        hi = (arr >> np.uint64(32)).astype(np.uint32)
    return jnp.asarray(lo), jnp.asarray(hi)


def to_host(pair) -> np.ndarray:
    """(lo, hi) device pair -> uint64 ndarray."""
    import ctypes

    lo32 = np.ascontiguousarray(np.asarray(pair[0], dtype=np.uint32))
    hi32 = np.ascontiguousarray(np.asarray(pair[1], dtype=np.uint32))
    lib = _native_lib()
    if lib is not None:
        out = np.empty(lo32.shape, dtype=np.uint64)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        lib.sealtpu_merge_u64(
            lo32.ctypes.data_as(u32p), hi32.ctypes.data_as(u32p), lo32.size,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
        return out
    return lo32.astype(np.uint64) | (hi32.astype(np.uint64) << np.uint64(32))


def zeros_pair(shape):
    z = jnp.zeros(shape, dtype=jnp.uint32)
    return z, jnp.zeros_like(z)


# ---------------------------------------------------------------------------
# Plaintext
# ---------------------------------------------------------------------------

class Plaintext:
    """BFV/BGV: ≤N coefficients mod t in a host uint64 vector (non-NTT).
    CKKS: a full RNS poly in NTT form on device, with a scale.
    (parity: plaintext.h:56+)"""

    def __init__(self, coeff_count: int = 0):
        self.data = np.zeros(coeff_count, dtype=np.uint64)   # host form
        self.rns_data = None                                  # device pair [L, N] (NTT form)
        self.parms_id: ParmsId = PARMS_ID_ZERO
        self.scale: float = 1.0

    @property
    def rns_data(self):
        d = self._rns_data
        if type(d) is _LazyHostData:
            # see Ciphertext.data: materialize outside any active trace
            import jax

            with jax.ensure_compile_time_eval():
                dev = to_device(d.arr)
            self._rns_data = dev
            self.host_mirror = (d.arr, dev)
            return dev
        return d

    @rns_data.setter
    def rns_data(self, v):
        self._rns_data = v

    def host_rns_u64(self) -> np.ndarray | None:
        """Host u64 [L, N] NTT rows WITHOUT forcing device materialization
        (the lazy array or a fresh host_mirror), else None."""
        d = self._rns_data
        if type(d) is _LazyHostData:
            return d.arr
        m = getattr(self, "host_mirror", None)
        if m is not None and m[1] is d:
            return m[0]
        return None

    @property
    def is_ntt_form(self) -> bool:
        return self.parms_id != PARMS_ID_ZERO

    @property
    def coeff_count(self) -> int:
        d = self._rns_data
        if d is None:
            return len(self.data)
        if type(d) is _LazyHostData:
            return d.arr.shape[-1]
        return d[0].shape[-1]

    def set_values(self, values):
        self.data = np.asarray(values, dtype=np.uint64)

    def significant_coeff_count(self) -> int:
        nz = np.nonzero(self.data)[0]
        return int(nz[-1]) + 1 if len(nz) else 0

    def nonzero_coeff_count(self) -> int:
        """Number of nonzero coefficients (plaintext.h nonzero_coeff_count).

        For RNS/NTT-form plaintexts the reference counts nonzero entries of
        the full L*N backing array (get_nonzero_uint64_count_uint over
        data_), not logical coefficients — match that.
        """
        if self._rns_data is not None:
            h = self.host_rns_u64()
            arr = h if h is not None else to_host(self.rns_data)
            return int(np.count_nonzero(arr))
        return int(np.count_nonzero(self.data))

    def set_zero(self):
        """Zero every coefficient in place (plaintext.h set_zero)."""
        if self._rns_data is not None:
            h = self.host_rns_u64()
            rows = (np.zeros_like(h) if h is not None
                    else np.zeros_like(to_host(self.rns_data)))
            self.rns_data = to_device(rows)
        self.data = np.zeros_like(np.asarray(self.data, dtype=np.uint64))

    def is_zero(self) -> bool:
        """All coefficients zero (plaintext.h is_zero parity)."""
        if self.rns_data is not None:
            return not (np.any(np.asarray(self.rns_data[0]))
                        or np.any(np.asarray(self.rns_data[1])))
        return not np.any(self.data)

    def to_hex_string(self) -> str:
        """Polynomial-as-hex-string form used by the reference tests
        (e.g. '3x^2 + 1x^1 + 2')."""
        terms = []
        for i in range(len(self.data) - 1, -1, -1):
            v = int(self.data[i])
            if v:
                terms.append(f"{v:X}x^{i}" if i else f"{v:X}")
        return " + ".join(terms) if terms else "0"

    @staticmethod
    def from_hex_string(s: str) -> "Plaintext":
        s = s.strip()
        if s == "0" or not s:
            return Plaintext(0)
        coeffs = {}
        for term in s.split("+"):
            term = term.strip()
            if "x^" in term:
                c, e = term.split("x^")
                coeffs[int(e)] = int(c, 16)
            else:
                coeffs[0] = int(term, 16)
        p = Plaintext(max(coeffs) + 1)
        for e, c in coeffs.items():
            p.data[e] = c
        return p

    def __eq__(self, other):
        if not isinstance(other, Plaintext):
            return NotImplemented
        a, b = self.data, other.data
        n = max(len(a), len(b))
        pa = np.zeros(n, dtype=np.uint64)
        pb = np.zeros(n, dtype=np.uint64)
        pa[:len(a)] = a
        pb[:len(b)] = b
        return bool(np.array_equal(pa, pb)) and (
            self.rns_data is None) == (other.rns_data is None)

    def __repr__(self):
        return f"Plaintext({self.to_hex_string() if self.rns_data is None else '<ntt form>'})"


# ---------------------------------------------------------------------------
# Ciphertext
# ---------------------------------------------------------------------------

class _LazyHostData:
    """Host u64 [size, L, N] ciphertext data pending device conversion.

    The host API (encrypt/decrypt/serialize) is a pure-host flow in the
    reference; producing device arrays eagerly paid ~100-300 us of jax
    boundary cost per encrypt that SEAL never pays. Ciphertext.data
    materializes on first device use (any Evaluator op); host consumers
    read through Ciphertext.host_u64() without converting (r4)."""

    __slots__ = ("arr",)

    def __init__(self, arr: np.ndarray):
        self.arr = arr


class Ciphertext:
    """size >= 2 polynomials over the level's tower: device pair [size, L, N]
    (parity: ciphertext.h:701-715)."""

    def __init__(self, data=None, parms_id: ParmsId = PARMS_ID_ZERO,
                 is_ntt_form: bool = False, scale: float = 1.0,
                 correction_factor: int = 1):
        self.data = data                      # (lo, hi) pair [size, L, N]
        self.parms_id = parms_id
        self.is_ntt_form = is_ntt_form
        self.scale = scale
        self.correction_factor = correction_factor
        self.seed_info = None                 # (prng_type, seed) for seeded c1

    @property
    def data(self):
        d = self._data
        if type(d) is _LazyHostData:
            # materialize OUTSIDE any active jit trace: the converted arrays
            # are cached across traces, and a value created while tracing
            # would be a leaked tracer (first touch may be a closure capture
            # inside jax.jit — e.g. examples/13_streaming_pipeline.py)
            import jax

            with jax.ensure_compile_time_eval():
                dev = to_device(d.arr)
            self._data = dev
            # keep the host mirror for native decrypt / serialization
            self.host_np = (d.arr, dev)
            return dev
        return d

    @data.setter
    def data(self, v):
        self._data = v

    def host_u64(self) -> np.ndarray | None:
        """Host u64 [size, L, N] mirror WITHOUT forcing device
        materialization: the lazy array, or a fresh host_np cache, or None
        when only device data exists."""
        d = self._data
        if type(d) is _LazyHostData:
            return d.arr
        m = getattr(self, "host_np", None)
        if m is not None and m[1] is d:
            return m[0]
        return None

    @property
    def _shape(self):
        d = self._data
        if d is None:
            return None
        return d.arr.shape if type(d) is _LazyHostData else d[0].shape

    @property
    def size(self) -> int:
        s = self._shape
        return 0 if s is None else s[0]

    @property
    def coeff_modulus_size(self) -> int:
        s = self._shape
        return 0 if s is None else s[1]

    @property
    def poly_modulus_degree(self) -> int:
        s = self._shape
        return 0 if s is None else s[2]

    def poly(self, j: int):
        """The j-th polynomial as a [L, N] pair."""
        return self.data[0][j], self.data[1][j]

    def to_numpy(self) -> np.ndarray:
        host = self.host_u64()
        if host is not None:
            return host
        return to_host(self.data)

    def copy(self) -> "Ciphertext":
        c = Ciphertext(self._data, self.parms_id, self.is_ntt_form, self.scale,
                       self.correction_factor)
        c.seed_info = self.seed_info
        return c

    def is_transparent(self) -> bool:
        """True when c1 (and above) are all zero: decryptable without the
        secret key (parity: ciphertext.h is_transparent +
        SEAL_THROW_ON_TRANSPARENT_CIPHERTEXT). Under jit tracing the data
        is symbolic, so the check is skipped (returns False)."""
        if self.size < 2:
            return True
        host = self.host_u64()
        if host is not None:
            return bool((host[1:] == 0).all())
        import jax.core

        lo, hi = self.data
        if isinstance(lo, jax.core.Tracer):
            return False
        return bool(
            (np.asarray(lo[1:]) == 0).all() and (np.asarray(hi[1:]) == 0).all()
        )

    def __repr__(self):
        return (
            f"Ciphertext(size={self.size}, L={self.coeff_modulus_size}, "
            f"n={self.poly_modulus_degree}, ntt={self.is_ntt_form}, scale={self.scale})"
        )


# Ciphertext is a jax pytree: data arrays are leaves, metadata is static.
# This makes whole evaluator pipelines jit/vmap-able over Ciphertext objects.
import jax.tree_util as _jtu


def _ct_flatten(ct: "Ciphertext"):
    return (ct.data,), (ct.parms_id, ct.is_ntt_form, ct.scale,
                        ct.correction_factor, ct.seed_info)


def _ct_unflatten(aux, children):
    ct = Ciphertext(children[0], aux[0], aux[1], aux[2], aux[3])
    ct.seed_info = aux[4]
    return ct


_jtu.register_pytree_node(Ciphertext, _ct_flatten, _ct_unflatten)


def stack_polys(polys) -> tuple:
    """List of [L, N] pairs -> [size, L, N] pair."""
    return (
        jnp.stack([p[0] for p in polys]),
        jnp.stack([p[1] for p in polys]),
    )


# ---------------------------------------------------------------------------
# Keys
# ---------------------------------------------------------------------------

class SecretKey:
    """NTT-form RNS poly at key level: device pair [L, N]
    (parity: secretkey.h — a Plaintext wrapper in the reference).

    Like Ciphertext, the native sampling path stores host u64 rows lazily;
    the device pair materializes on first device use (keyswitch-key
    generation, device decrypt) while host flows (native keygen/decrypt,
    serialization) read through host_u64()."""

    def __init__(self, data=None, parms_id: ParmsId = PARMS_ID_ZERO):
        self.data = data
        self.parms_id = parms_id

    @property
    def data(self):
        d = self._data
        if type(d) is _LazyHostData:
            # see Ciphertext.data: materialize outside any active trace
            import jax

            with jax.ensure_compile_time_eval():
                dev = to_device(d.arr)
            self._data = dev
            self._host_u64 = d.arr
            return dev
        return d

    @data.setter
    def data(self, v):
        self._data = v

    def host_u64(self) -> np.ndarray | None:
        """Host u64 [L, N] mirror WITHOUT forcing device materialization."""
        d = self._data
        if type(d) is _LazyHostData:
            return d.arr
        return getattr(self, "_host_u64", None)

    def to_numpy(self) -> np.ndarray:
        h = self.host_u64()
        return np.array(h) if h is not None else to_host(self.data)


class PublicKey:
    """A size-2 NTT-form encryption of zero at key level."""

    def __init__(self, ciphertext: Optional[Ciphertext] = None):
        self.data = ciphertext if ciphertext is not None else Ciphertext()

    @property
    def parms_id(self) -> ParmsId:
        return self.data.parms_id


class KSwitchKeys:
    """keys[target][decomp_prime] = size-2 NTT PublicKey over the extended
    (key-level) tower (parity: kswitchkeys.h). Stored stacked on device:
    data[k] = pair [L_decomp, 2, L_key, N] for target k."""

    def __init__(self):
        self.keys: list = []          # per target: (lo, hi) [L_decomp, 2, L_key, N]
        self.parms_id: ParmsId = PARMS_ID_ZERO
        # save_seed keygen: seeds[target][digit] = c1 PRNG info, enabling
        # seed-compressed (half-size) serialization (serializable.h)
        self.seeds: list | None = None

    @property
    def size(self) -> int:
        return len(self.keys)


class RelinKeys(KSwitchKeys):
    """Key-switching keys for s^2, s^3, ... (parity: relinkeys.h)."""

    @staticmethod
    def get_index(key_power: int) -> int:
        if key_power < 2:
            raise ValueError("key_power cannot be less than 2")
        return key_power - 2

    def has_key(self, key_power: int) -> bool:
        i = self.get_index(key_power)
        return i < len(self.keys) and self.keys[i] is not None

    def key(self, key_power: int):
        return self.keys[self.get_index(key_power)]


class GaloisKeys(KSwitchKeys):
    """Key-switching keys indexed by Galois element (parity: galoiskeys.h)."""

    @staticmethod
    def get_index(galois_elt: int) -> int:
        if galois_elt < 3 or galois_elt % 2 == 0:
            raise ValueError("galois_elt is not valid")
        return (galois_elt - 1) >> 1

    def has_key(self, galois_elt: int) -> bool:
        i = self.get_index(galois_elt)
        return i < len(self.keys) and self.keys[i] is not None

    def key(self, galois_elt: int):
        return self.keys[self.get_index(galois_elt)]
