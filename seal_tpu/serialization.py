"""SEAL 4.0 wire-format serialization.

Parity: seal::Serialization (/root/reference/native/src/seal/
serialization.{h,cpp}): 16-byte SEALHeader {magic 0xA15E, header_size 0x10,
version, compr_mode, reserved, total size}, nested per-object headers, and
the member layouts of Modulus (modulus.cpp:18), EncryptionParameters
(encryptionparams.cpp:15), Plaintext (plaintext.cpp:204), Ciphertext with
seed compression (ciphertext.cpp:190-340), SecretKey/PublicKey wrappers,
KSwitchKeys (kswitchkeys.cpp:42), and UniformRandomGeneratorInfo
(randomgen.cpp:99). Byte-compatible: objects serialized by the reference
load here and vice versa.

Compression: none and zlib (deflate) always; zstd when the `zstandard`
module is importable (parity: util/ztools.cpp).
"""

from __future__ import annotations

import enum
import io
import struct
import zlib

import numpy as np

from seal_tpu import randomgen
from seal_tpu.dtypes import (
    Ciphertext,
    GaloisKeys,
    KSwitchKeys,
    Plaintext,
    PublicKey,
    RelinKeys,
    SecretKey,
    _LazyHostData,
    to_device,
    to_host,
)
from seal_tpu.encryption_params import EncryptionParameters, SchemeType
from seal_tpu.modulus import Modulus

SEAL_MAGIC = 0xA15E
HEADER_SIZE = 0x10
VERSION_MAJOR = 4
VERSION_MINOR = 0

try:
    import zstandard as _zstd
except ImportError:  # pragma: no cover - environment-dependent
    _zstd = None


class ComprMode(enum.IntEnum):
    NONE = 0
    ZLIB = 1
    ZSTD = 2


def _compress(data: bytes, mode: ComprMode) -> bytes:
    if mode == ComprMode.NONE:
        return data
    if mode == ComprMode.ZLIB:
        return zlib.compress(data)
    if mode == ComprMode.ZSTD:
        if _zstd is None:
            raise ValueError("zstd compression is not available")
        return _zstd.ZstdCompressor().compress(data)
    raise ValueError("unsupported compression mode")


def _decompress(data: bytes, mode: ComprMode) -> bytes:
    if mode == ComprMode.NONE:
        return data
    if mode == ComprMode.ZLIB:
        return zlib.decompress(data)
    if mode == ComprMode.ZSTD:
        if _zstd is None:
            raise ValueError("zstd compression is not available")
        return _zstd.ZstdDecompressor().decompress(data)
    raise ValueError("unsupported compression mode")


def wrap(members: bytes, compr_mode: ComprMode = ComprMode.NONE) -> bytes:
    """Prefix a SEALHeader to (possibly compressed) member bytes."""
    payload = _compress(members, compr_mode)
    size = HEADER_SIZE + len(payload)
    header = struct.pack(
        "<HBBBBHQ", SEAL_MAGIC, HEADER_SIZE, VERSION_MAJOR, VERSION_MINOR,
        int(compr_mode), 0, size,
    )
    return header + payload


def load_header(header: bytes, try_upgrade_if_invalid: bool = True):
    """Parse a 16-byte SEALHeader; optionally upgrade a legacy SEAL 3.4
    header in place (parity: serialization.h:212 LoadHeader +
    legacy_headers::SEALHeader_3_4 — magic u16, zero u8, compr u8,
    size u32, reserved u64). Returns (vmaj, vmin, compr_mode, size)."""
    magic, hsize, vmaj, vmin, compr, _res, size = struct.unpack("<HBBBBHQ", header)
    valid = (magic == SEAL_MAGIC and hsize == HEADER_SIZE
             and vmaj <= VERSION_MAJOR and compr in ComprMode._value2member_map_)
    if not valid and try_upgrade_if_invalid:
        l_magic, l_zero, l_compr, l_size, _l_res = struct.unpack("<HBBIQ", header)
        if (l_magic == SEAL_MAGIC and l_zero == 0
                and l_compr in ComprMode._value2member_map_):
            return 3, 4, ComprMode(l_compr), l_size
    if magic != SEAL_MAGIC:
        raise ValueError("SEALHeader is invalid (bad magic)")
    if hsize != HEADER_SIZE:
        raise ValueError("SEALHeader is invalid (bad size)")
    if vmaj > VERSION_MAJOR:
        raise ValueError("unsupported SEAL version")
    return vmaj, vmin, ComprMode(compr), size


def unwrap(stream: io.BytesIO) -> bytes:
    """Read one SEALHeader-framed object from the stream; returns members."""
    header = stream.read(HEADER_SIZE)
    if len(header) != HEADER_SIZE:
        raise ValueError("insufficient data for SEALHeader")
    vmaj, vmin, compr, size = load_header(header)
    if (vmaj, vmin) == (3, 4):
        raise ValueError(
            "legacy SEAL 3.4 payloads use a pre-4.0 member wire format; "
            "only the header can be recognized")
    payload = stream.read(size - HEADER_SIZE)
    return _decompress(payload, compr)


def _u64s(values) -> bytes:
    return np.asarray(values, dtype="<u8").tobytes()


def _read_u64s(stream, count) -> np.ndarray:
    return np.frombuffer(stream.read(8 * count), dtype="<u8").copy()


# -- DynArray ---------------------------------------------------------------

def _dynarray_bytes(values: np.ndarray) -> bytes:
    members = struct.pack("<Q", values.size) + _u64s(values)
    return wrap(members, ComprMode.NONE)


def _load_dynarray(stream: io.BytesIO) -> np.ndarray:
    members = io.BytesIO(unwrap(stream))
    (size,) = struct.unpack("<Q", members.read(8))
    remaining = len(members.getbuffer()) - members.tell()
    if 8 * size > remaining:
        raise ValueError("dynarray size exceeds the payload")
    return _read_u64s(members, size)


# -- Modulus ------------------------------------------------------------------

def save_modulus(m: Modulus, compr_mode: ComprMode = ComprMode.NONE) -> bytes:
    return wrap(struct.pack("<Q", m.value), compr_mode)


def load_modulus(stream: io.BytesIO) -> Modulus:
    (value,) = struct.unpack("<Q", unwrap(stream)[:8])
    return Modulus(value)


# -- EncryptionParameters --------------------------------------------------------

def save_encryption_parameters(parms: EncryptionParameters,
                               compr_mode: ComprMode = ComprMode.NONE) -> bytes:
    buf = io.BytesIO()
    buf.write(struct.pack("<B", int(parms.scheme)))
    buf.write(struct.pack("<Q", parms.poly_modulus_degree))
    buf.write(struct.pack("<Q", len(parms.coeff_modulus)))
    for m in parms.coeff_modulus:
        buf.write(save_modulus(m))
    buf.write(save_modulus(parms.plain_modulus))
    return wrap(buf.getvalue(), compr_mode)


def load_encryption_parameters(data: bytes | io.BytesIO) -> EncryptionParameters:
    stream = io.BytesIO(data) if isinstance(data, (bytes, bytearray)) else data
    members = io.BytesIO(unwrap(stream))
    (scheme,) = struct.unpack("<B", members.read(1))
    (n,) = struct.unpack("<Q", members.read(8))
    (count,) = struct.unpack("<Q", members.read(8))
    parms = EncryptionParameters(SchemeType(scheme))
    if n:
        parms.set_poly_modulus_degree(n)
    moduli = [load_modulus(members) for _ in range(count)]
    if moduli:
        parms.set_coeff_modulus(moduli)
    plain = load_modulus(members)
    if plain.value:
        parms.set_plain_modulus(plain)
    return parms


# -- PRNG info --------------------------------------------------------------------

def save_prng_info(info, compr_mode: ComprMode = ComprMode.NONE) -> bytes:
    prng_type, seed = info
    members = struct.pack("<B", int(prng_type)) + struct.pack("<8Q", *seed)
    return wrap(members, compr_mode)


def load_prng_info(stream: io.BytesIO):
    members = unwrap(stream)
    (prng_type,) = struct.unpack("<B", members[:1])
    seed = struct.unpack("<8Q", members[1:65])
    return (prng_type, seed)


# -- Plaintext ----------------------------------------------------------------------

def save_plaintext(p: Plaintext, compr_mode: ComprMode = ComprMode.NONE) -> bytes:
    buf = io.BytesIO()
    buf.write(struct.pack("<4Q", *p.parms_id))
    if p._rns_data is not None:
        host = p.host_rns_u64()
        data = (host if host is not None else to_host(p.rns_data)).reshape(-1)
    else:
        data = np.asarray(p.data, dtype=np.uint64)
    buf.write(struct.pack("<Q", data.size))
    buf.write(struct.pack("<d", p.scale))
    buf.write(_dynarray_bytes(data))
    return wrap(buf.getvalue(), compr_mode)


def load_plaintext(context, data: bytes | io.BytesIO) -> Plaintext:
    stream = io.BytesIO(data) if isinstance(data, (bytes, bytearray)) else data
    members = io.BytesIO(unwrap(stream))
    parms_id = struct.unpack("<4Q", members.read(32))
    (coeff_count,) = struct.unpack("<Q", members.read(8))
    (scale,) = struct.unpack("<d", members.read(8))
    values = _load_dynarray(members)
    p = Plaintext()
    p.scale = scale
    if parms_id != (0, 0, 0, 0):
        cd = context.get_context_data(parms_id)
        if cd is None:
            raise ValueError("plaintext parms_id is invalid for the context")
        L = cd.coeff_modulus_size
        n = cd.parms.poly_modulus_degree
        p.rns_data = to_device(values.reshape(L, n))
        p.parms_id = tuple(parms_id)
    else:
        p.data = values
    return p


# -- Ciphertext -----------------------------------------------------------------------

def save_ciphertext(ct: Ciphertext, compr_mode: ComprMode = ComprMode.NONE) -> bytes:
    buf = io.BytesIO()
    buf.write(struct.pack("<4Q", *ct.parms_id))
    buf.write(struct.pack("<B", 1 if ct.is_ntt_form else 0))
    buf.write(struct.pack("<Q", ct.size))
    buf.write(struct.pack("<Q", ct.poly_modulus_degree))
    buf.write(struct.pack("<Q", ct.coeff_modulus_size))
    buf.write(struct.pack("<d", ct.scale))
    buf.write(struct.pack("<Q", ct.correction_factor))
    data = ct.to_numpy()
    if ct.seed_info is not None and ct.size == 2:
        # seed-compressed: save only c0 and the PRNG info
        buf.write(_dynarray_bytes(data[0].reshape(-1)))
        buf.write(save_prng_info(ct.seed_info))
    else:
        buf.write(_dynarray_bytes(data.reshape(-1)))
    return wrap(buf.getvalue(), compr_mode)


def load_ciphertext(context, data: bytes | io.BytesIO,
                    _allow_key_levels: bool = False) -> Ciphertext:
    from seal_tpu import rlwe

    stream = io.BytesIO(data) if isinstance(data, (bytes, bytearray)) else data
    members = io.BytesIO(unwrap(stream))
    parms_id = struct.unpack("<4Q", members.read(32))
    (is_ntt,) = struct.unpack("<B", members.read(1))
    (size,) = struct.unpack("<Q", members.read(8))
    (n,) = struct.unpack("<Q", members.read(8))
    (L,) = struct.unpack("<Q", members.read(8))
    (scale,) = struct.unpack("<d", members.read(8))
    (correction,) = struct.unpack("<Q", members.read(8))
    cd = context.get_context_data(parms_id)
    if cd is None:
        raise ValueError("ciphertext parms_id is invalid for the context")
    values = _load_dynarray(members)
    if values.size == n * L and size == 2:
        # seeded: expand c1 from the stored PRNG info
        prng_type, seed = load_prng_info(members)
        prng = randomgen.make_prng(randomgen.PrngType(prng_type), seed)
        c1 = rlwe.sample_poly_uniform(prng, cd.key_moduli(), n)
        full = np.stack([values.reshape(L, n), c1])
    else:
        full = values.reshape(size, L, n)
    ct = Ciphertext(
        to_device(full), parms_id=tuple(parms_id), is_ntt_form=bool(is_ntt),
        scale=scale, correction_factor=int(correction),
    )
    _check_loaded(ct, context, _allow_key_levels)
    return ct


def _check_loaded(obj, context, allow_key_levels: bool = False):
    """Reject out-of-range/malformed deserialized objects (parity:
    Ciphertext/keys ::load -> valcheck is_valid_for, valcheck.cpp:31-162)."""
    from seal_tpu import valcheck

    ok = (
        valcheck.is_metadata_valid_for(obj, context, allow_pure_key_levels=True)
        if allow_key_levels and isinstance(obj, Ciphertext)
        else valcheck.is_metadata_valid_for(obj, context)
    )
    ok = ok and valcheck.is_buffer_valid(obj) and valcheck.is_data_valid_for(obj, context)
    if not ok:
        raise ValueError("loaded data is invalid for the encryption parameters")


# -- Keys ----------------------------------------------------------------------------

def save_secret_key(sk: SecretKey, compr_mode: ComprMode = ComprMode.NONE) -> bytes:
    p = Plaintext()
    host = sk.host_u64() if hasattr(sk, "host_u64") else None
    p.rns_data = _LazyHostData(host) if host is not None else sk.data
    p.parms_id = tuple(sk.parms_id)
    p.scale = 1.0
    return save_plaintext(p, compr_mode)


def load_secret_key(context, data) -> SecretKey:
    p = load_plaintext(context, data)
    sk = SecretKey(p.rns_data, tuple(p.parms_id))
    _check_loaded(sk, context)
    return sk


def save_public_key(pk: PublicKey, compr_mode: ComprMode = ComprMode.NONE) -> bytes:
    return save_ciphertext(pk.data, compr_mode)


def load_public_key(context, data) -> PublicKey:
    pk = PublicKey(load_ciphertext(context, data, _allow_key_levels=True))
    _check_loaded(pk, context)
    return pk


def save_kswitch_keys(keys: KSwitchKeys, compr_mode: ComprMode = ComprMode.NONE) -> bytes:
    buf = io.BytesIO()
    buf.write(struct.pack("<4Q", *keys.parms_id))
    buf.write(struct.pack("<Q", len(keys.keys)))
    seeds = getattr(keys, "seeds", None)
    for ki, k in enumerate(keys.keys):
        if k is None:
            buf.write(struct.pack("<Q", 0))
            continue
        arr = to_host(k)  # [L_decomp, 2, L_key, N]
        dim2 = arr.shape[0]
        buf.write(struct.pack("<Q", dim2))
        k_seeds = seeds[ki] if seeds is not None else None
        for i in range(dim2):
            ct = Ciphertext(
                to_device(arr[i]), parms_id=tuple(keys.parms_id),
                is_ntt_form=True,
            )
            if k_seeds is not None:
                # seed-compressed digit (save_seed keygen): c1 is replaced
                # by its PRNG info on the wire — half-size keys, exactly
                # the reference's Serializable<RelinKeys/GaloisKeys>
                ct.seed_info = k_seeds[i]
            buf.write(save_ciphertext(ct))
    return wrap(buf.getvalue(), compr_mode)


def _load_kswitch_into(keys: KSwitchKeys, context, data) -> KSwitchKeys:
    import jax.numpy as jnp

    stream = io.BytesIO(data) if isinstance(data, (bytes, bytearray)) else data
    members = io.BytesIO(unwrap(stream))
    parms_id = struct.unpack("<4Q", members.read(32))
    (dim1,) = struct.unpack("<Q", members.read(8))
    keys.parms_id = tuple(parms_id)
    keys.keys = []
    for _ in range(dim1):
        (dim2,) = struct.unpack("<Q", members.read(8))
        if dim2 == 0:
            keys.keys.append(None)
            continue
        cts = [load_ciphertext(context, members, _allow_key_levels=True)
               for _ in range(dim2)]
        lo = jnp.stack([ct.data[0] for ct in cts])
        hi = jnp.stack([ct.data[1] for ct in cts])
        keys.keys.append((lo, hi))
    _check_loaded(keys, context)
    return keys


def load_kswitch_keys(context, data) -> KSwitchKeys:
    return _load_kswitch_into(KSwitchKeys(), context, data)


def load_relin_keys(context, data) -> RelinKeys:
    return _load_kswitch_into(RelinKeys(), context, data)


def load_galois_keys(context, data) -> GaloisKeys:
    return _load_kswitch_into(GaloisKeys(), context, data)


save_relin_keys = save_kswitch_keys
save_galois_keys = save_kswitch_keys


# -- Reference-compat instance methods ----------------------------------------------
#
# Every serializable reference object exposes `obj.save(stream)` /
# `obj.load(context, stream)` (serialization.h Serialization::Save/Load
# wrappers on each class). seal_tpu's canonical API is the function form
# above (save_x(obj) -> bytes); these attached methods make reference call
# sites port verbatim: save() returns bytes, load() rebinds the loaded
# state onto the receiver (same object identity) and returns self.
# `seal_tpu/__init__` imports this module, so they are always present.

def _attach_io(cls, save_fn, load_fn, needs_context: bool):
    def save(self, compr_mode: ComprMode = ComprMode.NONE) -> bytes:
        return save_fn(self, compr_mode)

    def load(self, *args):
        out = load_fn(*args) if needs_context else load_fn(args[-1])
        self.__dict__.clear()
        self.__dict__.update(out.__dict__)
        return self

    save.__doc__ = f"Reference-compat: {save_fn.__name__}(self) -> bytes."
    load.__doc__ = (
        f"Reference-compat: {load_fn.__name__}(...), result rebound onto "
        f"self (same object identity)."
    )
    cls.save = save
    cls.load = load


_attach_io(Plaintext, save_plaintext, load_plaintext, True)
_attach_io(Ciphertext, save_ciphertext, load_ciphertext, True)
_attach_io(SecretKey, save_secret_key, load_secret_key, True)
_attach_io(PublicKey, save_public_key, load_public_key, True)
_attach_io(KSwitchKeys, save_kswitch_keys, load_kswitch_keys, True)
_attach_io(RelinKeys, save_relin_keys, load_relin_keys, True)
_attach_io(GaloisKeys, save_galois_keys, load_galois_keys, True)
_attach_io(EncryptionParameters, save_encryption_parameters,
           load_encryption_parameters, False)
# Modulus is a frozen value dataclass: save() only (use load_modulus()).
Modulus.save = lambda self, compr_mode=ComprMode.NONE: save_modulus(
    self, compr_mode)
