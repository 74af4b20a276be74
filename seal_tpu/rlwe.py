"""RLWE samplers and encryptions of zero.

Parity: seal::util samplers and encrypt_zero (/root/reference/native/src/
seal/util/rlwe.cpp): sample_poly_ternary :21, sample_poly_normal :40,
sample_poly_cbd :66, sample_poly_uniform :103, encrypt_zero_asymmetric :189,
encrypt_zero_symmetric :415, fork's encrypt_zero_symmetric_with_c1 :276.

Bit-exactness notes (SURVEY.md §7 hard part #2):
* ternary sampling goes through std::uniform_int_distribution<uint64_t>(0,2)
  over a 32-bit adapter; libstdc++ uses Lemire's method, whose rejection for
  range 3 fires only on a zero 32-bit draw — so the accepted sequence is
  exactly "the nonzero 32-bit words of the stream", which vectorizes.
* uniform sampling bulk-fills L*N*8 bytes first, then redraws rejected
  values (rand >= 2^64 - 2^64 mod q) one at a time, in (prime, coeff) order.
* CBD noise consumes 6 bytes per coefficient, no rejection.

Samplers run on host (numpy over the PRNG byte stream) and upload once;
everything after the sample is device compute.
"""

from __future__ import annotations

import numpy as np

from seal_tpu import randomgen
from seal_tpu.context import ContextData, SEALContext
from seal_tpu.dtypes import Ciphertext, PublicKey, SecretKey, stack_polys, to_device, to_host
from seal_tpu.encryption_params import SchemeType
from seal_tpu.ops import limb
from seal_tpu.ops import modring
from seal_tpu.ops import ntt as ntt_mod

NOISE_STANDARD_DEVIATION = 3.2
# util/globals.h:36-40: noise_max_deviation = σ · noise_distribution_width_multiplier (= 6)
NOISE_MAX_DEVIATION = 6 * 3.2


class _Stream:
    """Sequential byte cursor over a PRNG, enabling vectorized exact-order
    consumption."""

    def __init__(self, prng: randomgen.UniformRandomGenerator):
        self.prng = prng

    def take(self, n: int) -> bytes:
        return self.prng.generate(n)


def sample_poly_ternary(prng, moduli: list[int], n: int) -> np.ndarray:
    """Ternary {-1,0,1} poly lifted per prime -> uint64 [L, N]."""
    L = len(moduli)
    need = n
    words = np.frombuffer(prng.generate(4 * n), dtype="<u4")
    accepted = words[words != 0]
    while len(accepted) < n:
        extra = np.frombuffer(prng.generate(4 * (n - len(accepted))), dtype="<u4")
        accepted = np.concatenate([accepted, extra[extra != 0]])
    accepted = accepted[:n]
    # Lemire downscale for range 3: r = (w * 3) >> 32
    r = ((accepted.astype(np.uint64) * np.uint64(3)) >> np.uint64(32)).astype(np.uint64)
    out = np.empty((L, n), dtype=np.uint64)
    for j, q in enumerate(moduli):
        # value = r - 1 mod q: r=0 -> q-1, else r-1
        out[j] = np.where(r == 0, np.uint64(q - 1), r - np.uint64(1))
    return out


_POPCNT = np.array([bin(i).count("1") for i in range(256)], dtype=np.int32)


def sample_poly_cbd(prng, moduli: list[int], n: int) -> np.ndarray:
    """Centered binomial (σ=3.2) noise poly -> uint64 [L, N]."""
    L = len(moduli)
    stream = prng.generate(6 * n)
    from seal_tpu import native as _native

    rows = _native.cbd_from_bytes(stream, n, moduli)
    if rows is not None:
        return rows
    raw = np.frombuffer(stream, dtype=np.uint8).reshape(n, 6).copy()
    raw[:, 2] &= 0x1F
    raw[:, 5] &= 0x1F
    w = _POPCNT[raw]
    noise = (w[:, 0] + w[:, 1] + w[:, 2] - w[:, 3] - w[:, 4] - w[:, 5]).astype(np.int64)
    out = np.empty((L, n), dtype=np.uint64)
    for j, q in enumerate(moduli):
        out[j] = np.where(noise < 0, noise + q, noise).astype(np.uint64)
    return out


def sample_poly_uniform(prng, moduli: list[int], n: int) -> np.ndarray:
    """Uniform poly mod each prime -> uint64 [L, N] (rejection-exact)."""
    L = len(moduli)
    raw = np.frombuffer(prng.generate(L * n * 8), dtype="<u8").reshape(L, n).copy()
    max_random = 0xFFFFFFFFFFFFFFFF
    for j, q in enumerate(moduli):
        max_multiple = max_random - max_random % q - 1 + 1  # = 2^64 - (2^64 mod q)
        # NB: reference computes max_random - barrett(max_random) - 1 + ...:
        # max_multiple = (2^64 - 1) - ((2^64 - 1) mod q) - 1? keep exact form:
        max_multiple = max_random - (max_random % q) - 1
        rejected = np.nonzero(raw[j] >= max_multiple)[0]
        for i in rejected:
            v = int(raw[j, i])
            while v >= max_multiple:
                v = int(np.frombuffer(prng.generate(8), dtype="<u8")[0])
            raw[j, i] = v
        raw[j] %= np.uint64(q)
    return raw


def sample_poly_uniform_seal_3_5(prng, moduli: list[int], n: int) -> np.ndarray:
    """Legacy uniform sampler matching Microsoft SEAL <= 3.5 byte-for-byte
    (rlwe.cpp sample_poly_uniform_seal_3_5): strictly sequential per-element
    64-bit draws built from two 32-bit adapter reads, high word first."""
    L = len(moduli)
    out = np.empty((L, n), dtype=np.uint64)
    max_random = 0xFFFFFFFFFFFFFFFF
    for j, q in enumerate(moduli):
        max_multiple = max_random - (max_random % q) - 1
        for i in range(n):
            while True:
                a = int.from_bytes(prng.generate(4), "little")
                b = int.from_bytes(prng.generate(4), "little")
                rand = (a << 32) | b
                if rand < max_multiple:
                    break
            out[j, i] = rand % q
    return out


def sample_poly_uniform_seal_3_4(prng, moduli: list[int], n: int) -> np.ndarray:
    """Legacy uniform sampler matching Microsoft SEAL <= 3.4 byte-for-byte
    (rlwe.cpp sample_poly_uniform_seal_3_4): 63-bit draws assembled as
    (u32 << 31) | (u32 >> 1)."""
    L = len(moduli)
    out = np.empty((L, n), dtype=np.uint64)
    max_random = 0x7FFFFFFFFFFFFFFF
    for j, q in enumerate(moduli):
        max_multiple = max_random - (max_random % q) - 1
        for i in range(n):
            while True:
                a = int.from_bytes(prng.generate(4), "little")
                b = int.from_bytes(prng.generate(4), "little")
                rand = (a << 31) | (b >> 1)
                if rand < max_multiple:
                    break
            out[j, i] = rand % q
    return out


def sample_poly_normal(prng, moduli: list[int], n: int) -> np.ndarray:
    """Clipped rounded Gaussian (σ=3.2, bound 6σ) — the non-default noise
    sampler (SEAL_USE_GAUSSIAN_NOISE). Uses the same Box-Muller construction
    as util/clipnormal.h via std::normal_distribution; NOT byte-exact vs
    libstdc++ (documented deviation — the default build uses CBD)."""
    L = len(moduli)
    out = np.empty((L, n), dtype=np.uint64)
    vals = np.empty(n, dtype=np.int64)
    i = 0
    while i < n:
        u = np.frombuffer(prng.generate(16), dtype="<u8").astype(np.float64) / 2**64
        r = np.sqrt(-2.0 * np.log(max(u[0], 1e-300))) * NOISE_STANDARD_DEVIATION
        for g in (r * np.cos(2 * np.pi * u[1]), r * np.sin(2 * np.pi * u[1])):
            if abs(g) <= NOISE_MAX_DEVIATION and i < n:
                vals[i] = int(round(g))
                i += 1
    for j, q in enumerate(moduli):
        out[j] = np.where(vals < 0, vals + q, vals).astype(np.uint64)
    return out


# The default noise sampler (SEAL_NOISE_SAMPLER with SEAL_USE_GAUSSIAN_NOISE
# off, util/defines.h): centered binomial.
sample_noise = sample_poly_cbd


# ---------------------------------------------------------------------------
# Encryptions of zero
# ---------------------------------------------------------------------------

def _prng_for(context: SEALContext):
    parms = context.key_context_data().parms
    factory = randomgen.UniformRandomGeneratorFactory(
        parms.prng_type, seed=parms.random_seed)
    return factory.create()


def encrypt_zero_asymmetric(
    public_key: PublicKey, context: SEALContext, parms_id, is_ntt_form: bool
) -> Ciphertext:
    """c_j = u·pk_j + e_j (+t·e_j for BGV) (parity: rlwe.cpp:189-274).

    Runs on the native u64 host path when available (the eager JAX route,
    kept below as fallback/cross-check, costs ~0.5-2.5 s per call in pure
    dispatch at n=16384); PRNG draw order is identical."""
    from seal_tpu.native import poly as native_poly

    cd = context.get_context_data(parms_id)
    parms = cd.parms
    moduli = cd.key_moduli()
    n = parms.poly_modulus_degree
    scheme = parms.scheme
    tables = cd.ntt_tables
    mc = cd.mod_consts
    size = public_key.data.size

    np_polys = encrypt_zero_asymmetric_np(
        public_key, context, parms_id, is_ntt_form)
    if np_polys is not None:
        return Ciphertext(
            to_device(np_polys), parms_id=tuple(parms_id),
            is_ntt_form=is_ntt_form, scale=1.0, correction_factor=1,
        )

    prng = _prng_for(context)
    u = to_device(sample_poly_ternary(prng, moduli, n))
    u_ntt = ntt_mod.ntt_forward_eager(u, tables)

    L = len(moduli)
    polys = []
    for j in range(size):
        # pk lives at the key level; use only this level's first L rows
        # (parity: rlwe.cpp:232-240 iterates coeff_modulus_size rows of pk)
        pkj = public_key.data.poly(j)
        pkj = (pkj[0][:L], pkj[1][:L])
        cj = modring.dyadic_product(u_ntt, pkj, mc)
        if not is_ntt_form:
            cj = ntt_mod.ntt_inverse_eager(cj, tables)
        polys.append(cj)

    for j in range(size):
        e = sample_noise(prng, moduli, n)
        e_dev = to_device(e)
        if scheme == SchemeType.BGV:
            if is_ntt_form:
                e_dev = ntt_mod.ntt_forward_eager(e_dev, tables, lazy=True)
            t_op, t_qt = modring.shoup_pair(
                [[parms.plain_modulus.value % q] for q in moduli],
                [[q] for q in moduli], shape=(len(moduli), 1),
            )
            e_dev = limb.mul_mod_shoup(e_dev, t_op, t_qt, mc.q)
        else:
            if is_ntt_form:
                e_dev = ntt_mod.ntt_forward_eager(e_dev, tables)
        polys[j] = modring.add_poly(e_dev, polys[j], mc)

    return Ciphertext(
        stack_polys(polys), parms_id=tuple(parms_id), is_ntt_form=is_ntt_form,
        scale=1.0, correction_factor=1,
    )


# -- cached-jit post-sampling math (NTT-form encrypt-zero) -------------------
# Eager dispatch of the ~90 constituent u32 primitives dominated keygen wall
# time (profiled: 0.75 s of pure dispatch per galois key at n=16384); one
# executable per (scheme-flag, backend) removes it. jit re-traces per shape,
# so a single cache entry serves every (L, N). Bit-identical by construction:
# the same kernels run traced instead of dispatched.
_ezs_jit_cache: dict = {}


def _ezs_ntt_jit(bgv: bool):
    import jax

    dd = jax.config.jax_default_device
    plat = (dd if isinstance(dd, str) else dd.platform) if dd is not None \
        else jax.default_backend()
    key = (bgv, plat)
    fn = _ezs_jit_cache.get(key)
    if fn is None:
        if bgv:
            def body(sk, a, noise, tables, mc, t_op, t_qt):
                c0 = modring.dyadic_product(sk, a, mc)
                nz = ntt_mod.ntt_forward(noise, tables)
                nz = limb.mul_mod_shoup(nz, t_op, t_qt, mc.q)
                c0 = modring.add_poly(nz, c0, mc)
                return modring.negate_poly(c0, mc)
        else:
            def body(sk, a, noise, tables, mc):
                c0 = modring.dyadic_product(sk, a, mc)
                nz = ntt_mod.ntt_forward(noise, tables)
                c0 = modring.add_poly(nz, c0, mc)
                return modring.negate_poly(c0, mc)
        fn = jax.jit(body)
        _ezs_jit_cache[key] = fn
    return fn


def encrypt_zero_symmetric(
    secret_key: SecretKey, context: SEALContext, parms_id, is_ntt_form: bool,
    save_seed: bool = False, c1_override=None, c1_seed=None,
) -> Ciphertext:
    """(c0, c1) = (-(a·s + e), a), a uniform (parity: rlwe.cpp:415-545).

    c1_override (device [L, N] NTT pair) reuses a reference c1 — the fork's
    encrypt_zero_symmetric_with_c1 (rlwe.cpp:276-413) used by the multiparty
    common-public-key flow.
    """
    # native fast path with LAZY device data (r4): keygen/public-key flows
    # were paying ~0.5 ms of eager to_device+stack per call that the
    # encrypt path no longer pays. Only usable when c1_override is absent or
    # already host data — a device-pair override must take the device path,
    # so don't burn a full native encrypt only to discard it.
    r = None
    if c1_override is None or isinstance(c1_override, np.ndarray):
        r = encrypt_zero_symmetric_parts_np(
            secret_key, context, parms_id, c1_override, c1_seed,
            is_ntt_form=is_ntt_form, save_seed=save_seed)
    if r is not None:
        from seal_tpu.dtypes import _LazyHostData

        c0np, c1np, seed_info = r
        ct = Ciphertext(
            _LazyHostData(np.stack([c0np, c1np])), parms_id=tuple(parms_id),
            is_ntt_form=is_ntt_form, scale=1.0, correction_factor=1,
        )
        if save_seed:
            ct.seed_info = seed_info
        return ct
    c0, c1_out, seed_info = encrypt_zero_symmetric_parts(
        secret_key, context, parms_id, is_ntt_form, save_seed,
        c1_override, c1_seed)
    ct = Ciphertext(
        stack_polys([c0, c1_out]), parms_id=tuple(parms_id),
        is_ntt_form=is_ntt_form, scale=1.0, correction_factor=1,
    )
    if save_seed:
        ct.seed_info = seed_info
    return ct


def sk_host_u64(secret_key: SecretKey) -> np.ndarray:
    """Cached numpy u64 mirror of a secret key's device data (native path)."""
    h = getattr(secret_key, "host_u64", None)
    arr = h() if callable(h) else getattr(secret_key, "_host_u64", None)
    if arr is None:
        arr = np.ascontiguousarray(to_host(secret_key.data))
        secret_key._host_u64 = arr
    return arr


def encrypt_zero_symmetric_parts_np(
    secret_key: SecretKey, context: SEALContext, parms_id,
    c1_override=None, c1_seed=None, is_ntt_form: bool = True,
    save_seed: bool = False,
):
    """Native-path encrypt_zero_symmetric: raw (c0, c1, seed_info) as numpy
    u64 [L, N], or None when the native library is unavailable
    (seal_tpu/native/poly.py). Consumes the PRNG streams in exactly the
    order of the JAX path below; value-identical (validated in
    tests/test_native_poly.py + the golden-vector suites)."""
    from seal_tpu.native import poly as native_poly

    cd = context.get_context_data(parms_id)
    npoly = native_poly.for_context_data(cd)
    if npoly is None:
        return None
    parms = cd.parms
    moduli = [int(m) for m in cd.key_moduli()]
    n = parms.poly_modulus_degree
    L = len(moduli)
    bgv = parms.scheme == SchemeType.BGV

    bootstrap_prng = _prng_for(context)
    public_seed = tuple(
        np.frombuffer(bootstrap_prng.generate(randomgen.PRNG_SEED_BYTE_COUNT),
                      dtype="<u8").tolist()
    )
    prng_type = context.key_context_data().parms.prng_type
    seed_info = (int(prng_type), public_seed)
    if c1_override is not None:
        c1_ntt = np.ascontiguousarray(
            c1_override if isinstance(c1_override, np.ndarray)
            else to_host(c1_override))
        c1_out = (c1_ntt if is_ntt_form
                  else npoly.ntt_inverse(c1_ntt.copy()))
        if c1_seed is not None:
            seed_info = c1_seed
    else:
        ciphertext_prng = randomgen.UniformRandomGeneratorFactory(
            prng_type).create(public_seed)
        a_raw = np.ascontiguousarray(
            sample_poly_uniform(ciphertext_prng, moduli, n))
        if is_ntt_form:
            c1_ntt = a_raw
            c1_out = a_raw
        elif save_seed:
            # sample is the coefficient form; NTT only for computing c0
            # (rlwe.cpp:482-491); serialized c1 is just the seed
            c1_ntt = npoly.ntt_forward(a_raw.copy())
            c1_out = a_raw
        else:
            # sample interpreted as NTT form, output in coefficient form
            c1_ntt = a_raw
            c1_out = npoly.ntt_inverse(a_raw.copy())

    noise = np.ascontiguousarray(sample_noise(bootstrap_prng, moduli, n))
    sk = np.ascontiguousarray(sk_host_u64(secret_key)[:L])
    if is_ntt_form:
        npoly.ntt_forward(noise)
        if bgv:
            t = parms.plain_modulus.value
            npoly.mul_scalar(noise, [t % q for q in moduli])
        c0 = npoly.keygen_c0(c1_ntt, sk, noise)
    else:
        c0 = npoly.dyadic_mul(sk, c1_ntt)
        npoly.ntt_inverse(c0)
        if bgv:
            t = parms.plain_modulus.value
            npoly.mul_scalar(noise, [t % q for q in moduli])
        npoly.add_neg_inplace(c0, noise)
    return c0, c1_out, seed_info


def _tiled_pairs(scalars, moduli, B):
    """Shoup pairs for L rows tiled B times (one big-int quotient per
    UNIQUE row, not per batch row)."""
    from seal_tpu.native.poly import _shoup_pairs

    s_op, s_qt, q = _shoup_pairs(scalars, moduli)
    return np.tile(s_op, B), np.tile(s_qt, B), np.tile(q, B)


def _uniform_batch_from_seeds(seeds, prng_type, moduli, n) -> np.ndarray:
    """B uniform polys [B, L, n], each ct from its own seeded PRNG —
    byte-identical to B sequential sample_poly_uniform calls (bulk fill,
    then per-element redraws in (prime, coeff) order per ct)."""
    B, L = len(seeds), len(moduli)
    factory = randomgen.UniformRandomGeneratorFactory(prng_type)
    prngs = [factory.create(s) for s in seeds]
    raw = np.empty((B, L, n), dtype=np.uint64)
    for b, prng in enumerate(prngs):
        raw[b] = np.frombuffer(
            prng.generate(L * n * 8), dtype="<u8").reshape(L, n)
    max_random = 0xFFFFFFFFFFFFFFFF
    maxm = np.asarray([max_random - (max_random % q) - 1 for q in moduli],
                      dtype=np.uint64)
    bad = raw >= maxm[None, :, None]
    if bad.any():
        # row-major argwhere = per-ct (prime, coeff) ascending — the exact
        # sequential redraw order (per-ct PRNGs are independent, so the
        # cross-ct interleave does not matter)
        for b, j, i in np.argwhere(bad):
            v = int(raw[b, j, i])
            mm = int(maxm[j])
            while v >= mm:
                v = int(np.frombuffer(prngs[b].generate(8), dtype="<u8")[0])
            raw[b, j, i] = v
    raw %= np.asarray(moduli, dtype=np.uint64)[None, :, None]
    return raw


def encrypt_zero_symmetric_many_np(
    secret_key: SecretKey, context: SEALContext, parms_id, B: int,
    is_ntt_form: bool = True, save_seed: bool = False,
):
    """B native encrypt_zero_symmetric calls in stacked numpy form:
    (c0s [B, L, N], c1s [B, L, N], seed_infos) or None when the native
    batch path is unavailable. Byte-identical to B sequential
    encrypt_zero_symmetric_parts_np calls: each ciphertext gets its own
    fresh bootstrap PRNG (matching _prng_for's per-call semantics) whose
    seed and noise bytes are taken in one combined stream read, and the
    heavy kernels run through ONE native crossing for the whole batch
    (TPU-native batch-amortized host API; no reference counterpart)."""
    from seal_tpu import native as _native
    from seal_tpu.native import poly as native_poly

    cd = context.get_context_data(parms_id)
    npoly = native_poly.for_context_data(cd)
    if npoly is None or not hasattr(npoly.lib, "sealtpu_keygen_c0_many"):
        return None
    parms = cd.parms
    moduli = [int(m) for m in cd.key_moduli()]
    n = parms.poly_modulus_degree
    L = len(moduli)
    bgv = parms.scheme == SchemeType.BGV
    prng_type = context.key_context_data().parms.prng_type

    SEED_B = randomgen.PRNG_SEED_BYTE_COUNT
    seeds, seed_infos, noise_parts = [], [], []
    for _ in range(B):
        # fresh bootstrap PRNG per ct (sequential parity); ONE stream read
        # covers its seed draw + CBD noise draw
        buf = _prng_for(context).generate(SEED_B + 6 * n)
        public_seed = tuple(
            np.frombuffer(buf[:SEED_B], dtype="<u8").tolist())
        seeds.append(public_seed)
        seed_infos.append((int(prng_type), public_seed))
        noise_parts.append(buf[SEED_B:])
    noise_all = _native.cbd_from_bytes(b"".join(noise_parts), B * n, moduli)
    if noise_all is None:
        return None
    noise = np.ascontiguousarray(
        noise_all.reshape(L, B, n).transpose(1, 0, 2))

    raw = _uniform_batch_from_seeds(seeds, prng_type, moduli, n)
    if is_ntt_form:
        c1_ntt = raw
        c1_out = raw
    elif save_seed:
        c1_ntt = npoly.ntt_forward_many(raw.copy())
        c1_out = raw
    else:
        c1_ntt = raw
        c1_out = npoly.ntt_inverse_many(raw.copy())

    sk = np.ascontiguousarray(sk_host_u64(secret_key)[:L])
    if bgv:
        t = parms.plain_modulus.value
        t_scalars = [t % q for q in moduli]
    if is_ntt_form:
        npoly.ntt_forward_many(noise)
        if bgv:
            native_poly._mul_scalar_rows(
                npoly.lib, noise.reshape(B * L, n), None, None,
                pairs=_tiled_pairs(t_scalars, moduli, B))
        c0 = npoly.keygen_c0_many(c1_ntt, sk, noise)
    else:
        c0 = npoly.dyadic_mul_shared_many(c1_ntt, sk)
        npoly.ntt_inverse_many(c0)
        if bgv:
            native_poly._mul_scalar_rows(
                npoly.lib, noise.reshape(B * L, n), None, None,
                pairs=_tiled_pairs(t_scalars, moduli, B))
        npoly.add_neg_inplace_many(c0, noise)
    return c0, c1_out, seed_infos


def encrypt_zero_asymmetric_many_np(
    public_key: PublicKey, context: SEALContext, parms_id, B: int,
    is_ntt_form: bool,
):
    """B native encrypt_zero_asymmetric calls in stacked form: list of
    per-poly arrays [size][B, L, N], or None when unavailable. Byte-
    identical to B sequential encrypt_zero_asymmetric_np calls (fresh
    per-ct PRNG; u, e_0, e_1 drawn in order from one combined read)."""
    from seal_tpu import native as _native
    from seal_tpu.native import poly as native_poly

    cd = context.get_context_data(parms_id)
    npoly = native_poly.for_context_data(cd)
    if npoly is None or not hasattr(npoly.lib, "sealtpu_keygen_c0_many"):
        return None
    parms = cd.parms
    moduli = [int(m) for m in cd.key_moduli()]
    n = parms.poly_modulus_degree
    scheme = parms.scheme
    size = public_key.data.size
    if size != 2:
        return None
    L = len(moduli)

    r_batch = np.empty((B, n), dtype=np.uint64)
    noise_parts = []
    for b in range(B):
        prng = _prng_for(context)
        # stream cursor over ONE prefetched read: a ternary rejection
        # (zero 32-bit word, ~n/2^32 per ct) consumes the NEXT stream
        # bytes — i.e. bytes prefetched for the noise — exactly like the
        # sequential sampler would, keeping byte-for-byte parity
        buf = prng.generate(4 * n + 6 * n * size)
        pos = 4 * n
        words = np.frombuffer(buf, dtype="<u4", count=n)
        accepted = words[words != 0]
        while len(accepted) < n:
            need = 4 * (n - len(accepted))
            if pos + need > len(buf):
                buf += prng.generate(pos + need - len(buf))
            extra = np.frombuffer(buf, dtype="<u4",
                                  count=need // 4, offset=pos)
            pos += need
            accepted = np.concatenate([accepted, extra[extra != 0]])
        r_batch[b] = ((accepted[:n].astype(np.uint64) * np.uint64(3))
                      >> np.uint64(32))
        need = 6 * n * size
        if pos + need > len(buf):
            buf += prng.generate(pos + need - len(buf))
        noise_parts.append(buf[pos:pos + need])
    # ternary lift per prime: r - 1 mod q (r = 0 -> q - 1)
    u = np.empty((B, L, n), dtype=np.uint64)
    for j, q in enumerate(moduli):
        u[:, j] = np.where(r_batch == 0, np.uint64(q - 1),
                           r_batch - np.uint64(1))
    noise_all = _native.cbd_from_bytes(
        b"".join(noise_parts), B * size * n, moduli)
    if noise_all is None:
        return None
    # [L, B*size*n] -> [size, B, L, n] (ct-major within each poly index)
    noise = np.ascontiguousarray(
        noise_all.reshape(L, B, size, n).transpose(2, 1, 0, 3))

    npoly.ntt_forward_many(u)
    pk = pk_host_u64(public_key)
    polys = []
    for j in range(size):
        cj = npoly.dyadic_mul_shared_many(
            u, np.ascontiguousarray(pk[j, :L]))
        if not is_ntt_form:
            npoly.ntt_inverse_many(cj)
        polys.append(cj)
    if scheme == SchemeType.BGV:
        t = parms.plain_modulus.value
        t_scalars = [t % q for q in moduli]
    for j in range(size):
        e = np.ascontiguousarray(noise[j])
        if scheme == SchemeType.BGV:
            if is_ntt_form:
                npoly.ntt_forward_many(e, lazy=True)
            native_poly._mul_scalar_rows(
                npoly.lib, e.reshape(B * L, n), None, None,
                pairs=_tiled_pairs(t_scalars, moduli, B))
        elif is_ntt_form:
            npoly.ntt_forward_many(e)
        npoly.add_inplace_many(polys[j], e)
    return polys


def encrypt_zero_asymmetric_np(
    public_key: PublicKey, context: SEALContext, parms_id, is_ntt_form: bool
) -> np.ndarray | None:
    """Native-path encrypt_zero_asymmetric returning numpy u64
    [size, L, N], or None when the native library is unavailable."""
    from seal_tpu.native import poly as native_poly

    cd = context.get_context_data(parms_id)
    npoly = native_poly.for_context_data(cd)
    if npoly is None:
        return None
    parms = cd.parms
    moduli = cd.key_moduli()
    n = parms.poly_modulus_degree
    scheme = parms.scheme
    size = public_key.data.size
    L = len(moduli)
    prng = _prng_for(context)
    u = np.ascontiguousarray(sample_poly_ternary(prng, moduli, n))
    npoly.ntt_forward(u)
    pk = pk_host_u64(public_key)
    polys = []
    for j in range(size):
        cj = npoly.dyadic_mul(u, np.ascontiguousarray(pk[j, :L]))
        if not is_ntt_form:
            npoly.ntt_inverse(cj)
        polys.append(cj)
    for j in range(size):
        e = np.ascontiguousarray(sample_noise(prng, moduli, n))
        if scheme == SchemeType.BGV:
            if is_ntt_form:
                npoly.ntt_forward(e, lazy=True)
            t = parms.plain_modulus.value
            npoly.mul_scalar(e, [t % int(q) for q in moduli])
        elif is_ntt_form:
            npoly.ntt_forward(e)
        npoly.add_inplace(polys[j], e)
    return np.stack(polys)


def pk_host_u64(public_key: PublicKey) -> np.ndarray:
    """Cached numpy u64 mirror of a public key's data [size, L, N] (reads
    the lazy host array directly when the pk was never device-materialized)."""
    arr = getattr(public_key, "_host_u64", None)
    if arr is None:
        arr = public_key.data.host_u64()
        if arr is None:
            arr = np.ascontiguousarray(to_host(public_key.data.data))
        public_key._host_u64 = arr
    return arr


def encrypt_zero_symmetric_parts(
    secret_key: SecretKey, context: SEALContext, parms_id, is_ntt_form: bool,
    save_seed: bool = False, c1_override=None, c1_seed=None,
):
    """encrypt_zero_symmetric returning raw (c0, c1, seed_info) polys —
    the kswitch keygen consumes the pair directly and stacks once per key
    instead of once per digit."""
    r = encrypt_zero_symmetric_parts_np(
        secret_key, context, parms_id, c1_override, c1_seed,
        is_ntt_form=is_ntt_form, save_seed=save_seed)
    if r is not None:
        c0, c1, seed_info = r
        c1_dev = (c1_override if c1_override is not None
                  and not isinstance(c1_override, np.ndarray) and is_ntt_form
                  else to_device(c1))
        return to_device(c0), c1_dev, seed_info
    cd = context.get_context_data(parms_id)
    parms = cd.parms
    moduli = cd.key_moduli()
    n = parms.poly_modulus_degree
    scheme = parms.scheme
    tables = cd.ntt_tables
    mc = cd.mod_consts

    bootstrap_prng = _prng_for(context)
    public_seed = tuple(
        np.frombuffer(bootstrap_prng.generate(randomgen.PRNG_SEED_BYTE_COUNT), dtype="<u8").tolist()
    )
    prng_type = context.key_context_data().parms.prng_type
    ciphertext_prng = randomgen.UniformRandomGeneratorFactory(prng_type).create(public_seed)

    seed_info = (int(prng_type), public_seed)
    if c1_override is not None:
        # fork's encrypt_zero_symmetric_with_c1 (rlwe.cpp:276-413): reuse a
        # reference c1 (caller passes the NTT form)
        c1_ntt = c1_override
        c1_out = c1_ntt if is_ntt_form else ntt_mod.ntt_inverse_eager(c1_ntt, tables)
        if c1_seed is not None:
            seed_info = c1_seed
    else:
        a_raw = to_device(sample_poly_uniform(ciphertext_prng, moduli, n))
        if is_ntt_form:
            # sample is the NTT form directly (rlwe.cpp:476-481)
            c1_ntt = a_raw
            c1_out = a_raw
        elif save_seed:
            # sample is the coefficient form; NTT only for computing c0
            # (rlwe.cpp:482-491); serialized c1 is just the seed
            c1_ntt = ntt_mod.ntt_forward_eager(a_raw, tables)
            c1_out = a_raw
        else:
            # sample interpreted as NTT form, output in coefficient form
            # (rlwe.cpp:529-536)
            c1_ntt = a_raw
            c1_out = ntt_mod.ntt_inverse_eager(a_raw, tables)

    noise = sample_noise(bootstrap_prng, moduli, n)
    noise_dev = to_device(noise)

    # the key-level NTT-form secret key restricted to this level's tower
    L = len(moduli)
    sk = (secret_key.data[0][:L], secret_key.data[1][:L])
    if is_ntt_form:
        # hot keygen path: one cached-jit executable for the whole math
        if scheme == SchemeType.BGV:
            t_op, t_qt = modring.shoup_pair(
                [[parms.plain_modulus.value % q] for q in moduli],
                [[q] for q in moduli], shape=(len(moduli), 1),
            )
            c0 = _ezs_ntt_jit(True)(sk, c1_ntt, noise_dev, tables, mc, t_op, t_qt)
        else:
            c0 = _ezs_ntt_jit(False)(sk, c1_ntt, noise_dev, tables, mc)
    else:
        c0 = modring.dyadic_product(sk, c1_ntt, mc)
        c0 = ntt_mod.ntt_inverse_eager(c0, tables)
        if scheme == SchemeType.BGV:
            t_op, t_qt = modring.shoup_pair(
                [[parms.plain_modulus.value % q] for q in moduli],
                [[q] for q in moduli], shape=(len(moduli), 1),
            )
            noise_dev = limb.mul_mod_shoup(noise_dev, t_op, t_qt, mc.q)
        c0 = modring.add_poly(noise_dev, c0, mc)
        c0 = modring.negate_poly(c0, mc)

    return c0, c1_out, seed_info
