"""Key generation: secret/public keys, relinearization and Galois keys,
plus the fork's multiparty (threshold) key flows.

Parity: seal::KeyGenerator (/root/reference/native/src/seal/keygenerator.cpp):
generate_sk :56, fork generate_secret_key :95 / generate_pk_with_sk :132 /
generate_pk_with_same_c1 :182 / create_common_secret_key :207 /
create_common_public_key :239, create_relin_keys :272, galois keys :404-580,
compute_secret_key_array :591, generate_one_kswitch_key :732.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from seal_tpu import rlwe
from seal_tpu.context import SEALContext
from seal_tpu.dtypes import (
    Ciphertext,
    GaloisKeys,
    KSwitchKeys,
    PublicKey,
    RelinKeys,
    SecretKey,
    _LazyHostData,
    stack_polys,
    to_device,
    to_host,
)
from seal_tpu.modulus import CIPHERTEXT_SIZE_MAX
from seal_tpu.ops import limb, modring
from seal_tpu.ops import ntt as ntt_mod


_absorb_cache: dict = {}


def _absorb_stack_jit():
    """Cached-jit kswitch-key finisher: per digit, c0 += new_key · factor
    per row (rows outside the digit carry factor 0, an exact Shoup no-op),
    then the whole [L_decomp, 2, L_key, N] key tensor is stacked — ONE
    executable per backend instead of per-row .at loops plus eager stacks.
    jit re-traces per (digit count, L_key, N). Bit-identical to the former
    loop by construction."""
    import jax

    dd = jax.config.jax_default_device
    plat = (dd if isinstance(dd, str) else dd.platform) if dd is not None \
        else jax.default_backend()
    fn = _absorb_cache.get(plat)
    if fn is None:
        def body(c0s, c1s, new_key, f_ops, f_qts, q):
            outs = []
            for c0, f_op, f_qt in zip(c0s, f_ops, f_qts):
                temp = limb.mul_mod_shoup(new_key, f_op, f_qt, q)
                outs.append(limb.add_mod(c0, temp, q))
            lo = jnp.stack([jnp.stack([a[0], b[0]])
                            for a, b in zip(outs, c1s)])
            hi = jnp.stack([jnp.stack([a[1], b[1]])
                            for a, b in zip(outs, c1s)])
            return lo, hi

        fn = jax.jit(body)
        _absorb_cache[plat] = fn
    return fn


class KeyGenerator:
    def __init__(self, context: SEALContext, secret_key: SecretKey | None = None):
        if not context.parameters_set:
            raise ValueError("encryption parameters are not set correctly")
        self.context = context
        if secret_key is not None:
            self.secret_key_ = secret_key
        else:
            self.secret_key_ = self._sample_secret_key()
        # cache of NTT-form powers of s: [k] holds s^(k+1), device [L, N].
        # Built on first use so a lazily-sampled secret key stays host-side
        # through pure-host keygen flows.
        self._sk_powers: list | None = None

    # -- secret / public ------------------------------------------------------

    def _sample_secret_key(self) -> SecretKey:
        from seal_tpu.native import poly as native_poly

        cd = self.context.key_context_data()
        moduli = cd.key_moduli()
        n = cd.parms.poly_modulus_degree
        prng = rlwe._prng_for(self.context)
        sk_np = rlwe.sample_poly_ternary(prng, moduli, n)
        npoly = native_poly.for_context_data(cd)
        if npoly is not None:
            sk_np = npoly.ntt_forward(np.ascontiguousarray(sk_np))
            return SecretKey(_LazyHostData(sk_np), tuple(cd.parms_id))
        sk = ntt_mod.ntt_forward_eager(to_device(sk_np), cd.ntt_tables)
        return SecretKey(sk, tuple(cd.parms_id))

    def secret_key(self) -> SecretKey:
        return self.secret_key_

    def create_public_key(self, save_seed: bool = False) -> PublicKey:
        cd = self.context.key_context_data()
        ct = rlwe.encrypt_zero_symmetric(
            self.secret_key_, self.context, cd.parms_id, is_ntt_form=True,
            save_seed=save_seed,
        )
        pk = PublicKey(ct)
        return pk

    # -- fork multiparty surface (keygenerator.cpp:95-518) ---------------------

    def generate_secret_key(self) -> SecretKey:
        """Fresh party secret key (does not replace this generator's key)."""
        return self._sample_secret_key()

    def create_public_key_with_sk(self, sk: SecretKey, save_seed: bool = False) -> PublicKey:
        return PublicKey(rlwe.encrypt_zero_symmetric(
            sk, self.context, self.context.key_parms_id, is_ntt_form=True,
            save_seed=save_seed,
        ))

    def create_public_key_with_same_c1(self, sk: SecretKey, ref: PublicKey) -> PublicKey:
        """Party public key sharing the reference's c1 (common reference
        string), keygenerator.cpp:182-205."""
        c1 = ref.data.poly(1)
        ct = rlwe.encrypt_zero_symmetric(
            sk, self.context, self.context.key_parms_id, is_ntt_form=True,
            c1_override=c1, c1_seed=ref.data.seed_info,
        )
        return PublicKey(ct)

    def create_common_secret_key(self, sks: list[SecretKey]) -> SecretKey:
        """csk = Σ party secret keys (keygenerator.cpp:207-238)."""
        cd = self.context.key_context_data()
        mc = cd.mod_consts
        acc = sks[0].data
        for sk in sks[1:]:
            acc = modring.add_poly(acc, sk.data, mc)
        return SecretKey(acc, tuple(cd.parms_id))

    def create_common_public_key(self, pks: list[PublicKey]) -> PublicKey:
        """cpk = (Σ party c0, shared c1) (keygenerator.cpp:239-270)."""
        cd = self.context.key_context_data()
        mc = cd.mod_consts
        c0 = pks[0].data.poly(0)
        for pk in pks[1:]:
            c0 = modring.add_poly(c0, pk.data.poly(0), mc)
        ct = Ciphertext(
            stack_polys([c0, pks[0].data.poly(1)]),
            parms_id=tuple(cd.parms_id), is_ntt_form=True,
        )
        return PublicKey(ct)

    # -- secret key powers ------------------------------------------------------

    def _compute_secret_key_powers(self, max_power: int):
        cd = self.context.key_context_data()
        mc = cd.mod_consts
        if self._sk_powers is None:
            self._sk_powers = [self.secret_key_.data]
        while len(self._sk_powers) < max_power:
            nxt = modring.dyadic_product(self._sk_powers[-1], self._sk_powers[0], mc)
            self._sk_powers.append(nxt)

    # -- key switching keys -------------------------------------------------------

    def _generate_one_kswitch_key(self, new_key, secret_key: SecretKey,
                                  c1_refs=None, seeds_out: list | None = None) -> tuple:
        """KSwitch key for `new_key` (NTT [L_key, N] pair): per decomposition
        prime i, an NTT encryption of zero whose c0's i-th RNS row absorbs
        new_key_i * (q_special mod q_i) (keygenerator.cpp:732-765).

        Returns a stacked device pair [L_decomp, 2, L_key, N]. When
        `seeds_out` is a list, each digit's c1 PRNG info is appended to it
        (the reference's save_seed plumbing, keygenerator.cpp:272-310 —
        seed-compressed key serialization).
        """
        ctx = self.context
        key_cd = ctx.key_context_data()
        if not ctx.using_keyswitching:
            raise RuntimeError("keyswitching is not supported by the context")
        if seeds_out is not None and c1_refs is not None:
            # the reference only seed-compresses keys whose c1 it sampled
            # itself; with an overridden c1 the freshly drawn seed would NOT
            # regenerate it, and a seed-compressed save would silently expand
            # to a different key on load
            raise ValueError(
                "save_seed cannot be combined with c1 overrides: the "
                "recorded seed would not regenerate the overridden c1")
        key_moduli = key_cd.key_moduli()
        data_count = len(ctx.first_context_data().key_moduli())
        alpha = key_cd.parms.special_modulus_size
        # P = product of the special primes; the absorbed per-row factor
        # P mod q_i generalizes the reference's q_special mod q_i. With
        # hybrid digits (alpha > 1) digit j absorbs on ALL its rows — the
        # CRT value P·s'·W_j·[W_j^{-1}]_{Q_j} the inner product needs
        # (docs/HYBRID_KEYSWITCH.md derivation).
        p_special = 1
        for q in key_moduli[len(key_moduli) - alpha:]:
            p_special *= q
        decomp_count = -(-data_count // alpha)
        mc = key_cd.mod_consts

        from seal_tpu.native import poly as native_poly

        npoly = native_poly.for_context_data(key_cd)
        if npoly is not None:
            # native u64 path: every digit's encrypt-zero + absorb runs in
            # C (seal_tpu/native/poly.py); ONE host->device transfer per key
            key_np = (new_key if isinstance(new_key, np.ndarray)
                      else np.ascontiguousarray(to_host(new_key)))
            digits = []
            for j in range(decomp_count):
                rows = set(range(j * alpha, min((j + 1) * alpha, data_count)))
                c0, c1, seed = rlwe.encrypt_zero_symmetric_parts_np(
                    secret_key, ctx, key_cd.parms_id,
                    c1_override=c1_refs[j] if c1_refs is not None else None,
                )
                if seeds_out is not None:
                    seeds_out.append(seed)
                factors = [p_special % q if i in rows else 0
                           for i, q in enumerate(key_moduli)]
                npoly.absorb(c0, key_np, factors)
                digits.append(np.stack([c0, c1]))
            return to_device(np.stack(digits))

        c0s, c1s, f_ops, f_qts = [], [], [], []
        for j in range(decomp_count):
            rows = set(range(j * alpha, min((j + 1) * alpha, data_count)))
            c0, c1, seed = rlwe.encrypt_zero_symmetric_parts(
                secret_key, ctx, key_cd.parms_id, is_ntt_form=True,
                c1_override=c1_refs[j] if c1_refs is not None else None,
            )
            if seeds_out is not None:
                seeds_out.append(seed)
            # vectorized absorb: rows outside the digit carry factor 0, so
            # the Shoup multiply yields exactly 0 there and the add is a
            # no-op — no per-row .at loop
            factors = [p_special % q if i in rows else 0
                       for i, q in enumerate(key_moduli)]
            f_op, f_qt = modring.shoup_pair(
                [[f] for f in factors], [[q] for q in key_moduli],
                shape=(len(key_moduli), 1))
            c0s.append(c0)
            c1s.append(c1)
            f_ops.append(f_op)
            f_qts.append(f_qt)
        # one executable absorbs every digit and stacks the key tensor
        return _absorb_stack_jit()(c0s, c1s, new_key, f_ops, f_qts, mc.q)

    def create_relin_keys(self, count: int = 1, save_seed: bool = False) -> RelinKeys:
        """Keys for s^2, ..., s^(count+1) (keygenerator.cpp:272-310)."""
        if not (1 <= count <= CIPHERTEXT_SIZE_MAX - 2):
            raise ValueError("invalid count")
        self._compute_secret_key_powers(count + 1)
        rk = RelinKeys()
        if save_seed:
            rk.seeds = []
        for p in range(2, count + 2):
            seeds = [] if save_seed else None
            rk.keys.append(
                self._generate_one_kswitch_key(
                    self._sk_powers[p - 1], self.secret_key_, seeds_out=seeds)
            )
            if save_seed:
                rk.seeds.append(seeds)
        rk.parms_id = tuple(self.context.key_parms_id)
        return rk

    def create_galois_keys(self, galois_elts=None, save_seed: bool = False,
                           secret_key: SecretKey | None = None,
                           c1_refs_per_elt=None,
                           steps: list[int] | None = None) -> GaloisKeys:
        """Keys for the automorphisms x -> x^elt (keygenerator.cpp:520-580);
        with secret_key/c1 overrides this is the fork's
        create_galois_keys_with_sk[_c1] (keygenerator.cpp:404-518).
        `steps=` is the reference's rotation-step overload
        (keygenerator.h create_galois_keys(const vector<int> &steps))."""
        ctx = self.context
        key_cd = ctx.key_context_data()
        gt = key_cd.galois_tool
        if steps is not None:
            if galois_elts is not None:
                raise ValueError("pass either galois_elts or steps, not both")
            galois_elts = gt.get_elts_from_steps(steps)
        if galois_elts is None:
            galois_elts = gt.get_elts_all()
        sk = secret_key if secret_key is not None else self.secret_key_
        from seal_tpu.native import poly as native_poly

        use_native = native_poly.for_context_data(key_cd) is not None
        gk = GaloisKeys()
        if save_seed:
            gk.seeds = []
        for idx, elt in enumerate(galois_elts):
            if elt % 2 == 0 or elt < 1:
                raise ValueError("Galois element is not valid")
            # rotate the secret key: apply_galois in NTT domain
            if use_native:
                rotated = gt.apply_galois_ntt_np(rlwe.sk_host_u64(sk), elt)
            else:
                rotated = gt.apply_galois_ntt(sk.data, elt)
            index = GaloisKeys.get_index(elt)
            while len(gk.keys) <= index:
                gk.keys.append(None)
                if save_seed:
                    gk.seeds.append(None)
            seeds = [] if save_seed else None
            gk.keys[index] = self._generate_one_kswitch_key(
                rotated, sk,
                c1_refs=c1_refs_per_elt[idx] if c1_refs_per_elt is not None else None,
                seeds_out=seeds,
            )
            if save_seed:
                gk.seeds[index] = seeds
        # the reference sizes the key vector to n — every possible index
        # (elt-1)/2 for odd elt < 2n (keygenerator.cpp create_galois_keys
        # resize; pinned by the seeded wire-format golden vector)
        n = key_cd.parms.poly_modulus_degree
        while len(gk.keys) < n:
            gk.keys.append(None)
            if save_seed:
                gk.seeds.append(None)
        gk.parms_id = tuple(ctx.key_parms_id)
        return gk

    def aggregate_galois_keys(self, galois_elts, key_shares: list[GaloisKeys]) -> GaloisKeys:
        """Common rotation keys = elementwise sum of per-party shares
        (fork's gen_common_galois_keys/aggregate_rot_keys,
        keygenerator.cpp:312-402)."""
        key_cd = self.context.key_context_data()
        mc = key_cd.mod_consts
        out = GaloisKeys()
        for elt in galois_elts:
            index = GaloisKeys.get_index(elt)
            while len(out.keys) <= index:
                out.keys.append(None)
            acc = key_shares[0].keys[index]
            for share in key_shares[1:]:
                k = share.keys[index]
                # sum only the c0 components (c1 is the shared CRS)
                summed_c0 = limb.add_mod(
                    (acc[0][:, 0], acc[1][:, 0]), (k[0][:, 0], k[1][:, 0]), mc.q
                )
                acc = (
                    acc[0].at[:, 0].set(summed_c0[0]),
                    acc[1].at[:, 0].set(summed_c0[1]),
                )
            out.keys[index] = acc
        # size to n like create_galois_keys (reference wire parity)
        while len(out.keys) < key_cd.parms.poly_modulus_degree:
            out.keys.append(None)
        out.parms_id = tuple(self.context.key_parms_id)
        return out
