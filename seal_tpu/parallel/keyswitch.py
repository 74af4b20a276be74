"""Tensor-parallel key switching: the decomposition axis sharded over 'tp'.

The reference keyswitch (evaluator.cpp:2382-2677) is a serial loop: for each
extended-modulus row I, accumulate ⟨decomposed-target row J, key[J][I]⟩ over
J with 128-bit lazy reduction. The TPU-parallel decomposition exploits that
everything indexed by J is independent until the final sum:

  * decompose + per-row reduction into the extended base + forward NTT
    (_switch_key_decompose, evaluator.cpp:2475-2514) touch only target row J
    → fully local on the shard owning J;
  * the key tensor [L_decomp, 2, L_key, N] is sharded over its leading
    decomposition axis → each chip reads only 1/tp of the (large) key;
  * the inner product is a contraction over J → ONE exact psum of the
    per-shard partial sums.

The psum must be exact u64 modular arithmetic on a u32 backend: each partial
is Barrett-reduced to [0, q) (q < 2^61), split into three 21-bit limbs held
in u32 lanes, psum'd (≤ 2^21·tp per lane — no overflow for tp ≤ 2048), then
recombined through a 128-bit add and reduced mod q. The result is therefore
bit-identical to the single-chip `Evaluator._switch_key_reduce`, and the
unchanged `_switch_key_tail` (divide-and-round by the special prime,
evaluator.cpp:2572-2676) runs on the replicated [2, L+1, N] product.

Collective cost per keyswitch: exactly one psum of 3×[2, L+1, N] u32 —
independent of the key size. Everything else in a CKKS
multiply→relinearize→rescale pipeline is per-tower-row local, so the whole
flagship op carries exactly one collective per key switch.

`TPEvaluator` is the user-facing wrapper: a drop-in Evaluator whose every
key-switching op (relinearize, apply_galois, rotate_rows/columns/vector,
complex_conjugate) routes the contraction through this shard_map path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from seal_tpu.dtypes import Ciphertext, stack_polys, to_device
from seal_tpu.encryption_params import SchemeType
from seal_tpu.evaluator import Evaluator
from seal_tpu.ops import limb, modring, ntt as ntt_mod


def _flat_specs(in_specs):
    """Flatten a shard_map in_specs tree into one PartitionSpec per array
    leaf (PartitionSpec is a tuple subclass, so plain tree flattening would
    descend into it)."""
    leaves, _ = jax.tree.flatten(in_specs, is_leaf=lambda x: isinstance(x, P))
    return leaves


def _split21(pair):
    """u64 value < 2^61 as (lo, hi) u32 → three 21/22-bit u32 limbs."""
    lo, hi = pair
    l0 = lo & jnp.uint32(0x1FFFFF)
    l1 = ((lo >> 21) | (hi << 11)) & jnp.uint32(0x1FFFFF)
    l2 = hi >> 10
    return jnp.stack([l0, l1, l2])


def _recombine21_mod(s, q, ratio0, ratio1):
    """Inverse of _split21 after a psum: s[3, ...] u32 limb sums (each
    < 2^32) → value mod q as a u64 pair, via one 128-bit add + Barrett."""
    z = jnp.zeros_like(s[0])
    lo64 = limb.add64(
        (s[0], z), limb.shl64((s[1], z), 21)
    )
    # s[2]·2^42 = (s2 << 10 into the hi u32 limb, s2 >> 22 into limb 2)
    a128 = (lo64[0], lo64[1], z, z)
    b128 = (z, s[2] << 10, s[2] >> 22, z)
    t = limb.add128(a128, b128)
    return limb.barrett_reduce_128((t[0], t[1]), (t[2], t[3]), q, ratio0, ratio1)


class TPKeySwitch:
    """shard_map key-switch over a mesh 'tp' axis for one context level.

    Usage (inside or outside jit):
        tks = TPKeySwitch(context, ct.parms_id, mesh)
        delta = tks.switch_key(ev, ct, target, keys_tensor)   # == ev._switch_key
    """

    def __init__(self, context, parms_id, mesh: Mesh, tp_axis: str = "tp"):
        cd = context.get_context_data(parms_id)
        key_cd = context.key_context_data()
        self.context = context
        self.cd = cd
        self.mesh = mesh
        self.axis = tp_axis
        self.tp = mesh.shape[tp_axis]
        self.scheme = cd.parms.scheme
        self.L = cd.coeff_modulus_size
        self.alpha = key_cd.parms.special_modulus_size
        # decomposition axis length: per-prime rows (reference algorithm)
        # or hybrid digits — either shards over 'tp' with one psum.
        # When it does not divide the mesh, the axis is ZERO-PADDED up to a
        # multiple of tp: padded key rows are zero, so their 128-bit MAC
        # contributions are exactly zero and the psum is bit-identical to
        # the unpadded contraction (r3, VERDICT item 4 — previously every
        # post-rescale level silently fell back to the single-chip path).
        self.decomp = (self.L if self.alpha == 1
                       else -(-self.L // self.alpha))
        self.d_pad = -(-self.decomp // self.tp) * self.tp
        key_moduli = key_cd.key_moduli()
        self.L_key = len(key_moduli)
        self.key_indices = (list(range(self.L))
                            + list(range(self.L_key - self.alpha, self.L_key)))
        self.ext_tables = ntt_mod.gather_tables(
            key_cd.ntt_tables, self.key_indices)
        self.ext_mc = modring.make_mod_consts(
            [key_moduli[i] for i in self.key_indices])
        if self.alpha > 1:
            from seal_tpu.ops import hybrid_keyswitch as hyb

            self._stacked = hyb.decomp_consts_stacked(
                tuple(key_moduli), self.alpha, self.L)
            if self.d_pad != self.decomp:
                # zero-pad the per-digit constant stacks to the mesh
                # multiple (padded digits contract against zero key rows)
                pad = self.d_pad - self.decomp
                self._stacked = jax.tree.map(
                    lambda a: jnp.concatenate(
                        [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)]),
                    self._stacked)
        self._reduce_fn = None
        self._in_specs = None
        self._hoisted_fns = {}    # k -> (jitted shard_map, in_specs)
        # Multi-host mode: when the mesh spans OS processes (true multi-host
        # TPU slices, or the gloo-transport CPU simulation in
        # tools/multihost_runner.py), per-process local arrays cannot feed a
        # global-mesh computation directly. All inputs here are globally
        # consistent (deterministic integer math from a fixed seed), so each
        # process materialises its own shards of the global arrays, and the
        # fully-replicated output is pulled back to a process-local array
        # for the (local) special-prime tail.
        self._multiprocess = any(
            d.process_index != jax.process_index()
            for d in np.asarray(mesh.devices).flat)

    def _dispatch(self, *args, fn=None, in_specs=None):
        """Call the compiled shard_map contraction; in multi-process mode,
        first lift the (globally consistent) inputs into global arrays laid
        out per in_specs, and lower the replicated outputs back to local."""
        if fn is None:
            fn, in_specs = self._reduce_fn, self._in_specs
        if not self._multiprocess:
            return fn(*args)
        leaves, treedef = jax.tree.flatten(args)
        specs = _flat_specs(in_specs)
        assert len(leaves) == len(specs)
        glob = []
        for x, spec in zip(leaves, specs):
            sh = jax.sharding.NamedSharding(self.mesh, spec)
            xh = np.asarray(x)
            glob.append(jax.make_array_from_callback(
                xh.shape, sh, lambda idx, xh=xh: xh[idx]))
        out = fn(*jax.tree.unflatten(treedef, glob))
        # out_specs are fully replicated -> every shard holds the full value
        return jax.tree.map(
            lambda a: jnp.asarray(np.asarray(a.addressable_shards[0].data)),
            out)

    # -- the sharded contraction ------------------------------------------------

    def _reduce_hybrid(self, t_coeff, keys_ext):
        """Hybrid digits sharded over 'tp': the coeff target is replicated
        (it is small), the stacked digit constants and the key tensor are
        sharded over the digit axis, and the contraction ends in the same
        single exact psum of 21-bit limb splits.

        Unlike the single-chip path, this transforms ALL of its shard's
        decompose rows — the CKKS diagonal skip's per-digit row exclusion
        does not fit the dense stage-sliced table layout inside shard_map.
        Outputs are still bit-identical (the skipped transforms equal the
        substituted rows exactly); the shard only pays up to L/tp extra
        forward rows."""
        from seal_tpu.ops import hybrid_keyswitch as hyb

        tp, axis = self.tp, self.axis
        I = self.L + self.alpha
        ext_tables, ext_mc = self.ext_tables, self.ext_mc
        d_loc = self.d_pad // tp

        def body(tc, stacked, k):
            rows_idx, iop, iqt, qd, he, hqt = stacked
            y = hyb.decompose_digits(
                tc, rows_idx, iop, iqt, qd, he, hqt, ext_mc)
            t_op = ntt_mod.ntt_forward(y, ext_tables)        # [d_loc, I, n]
            n = tc[0].shape[-1]
            acc = [
                tuple(jnp.zeros((I, n), dtype=jnp.uint32) for _ in range(4))
                for _ in range(2)
            ]
            for Jl in range(d_loc):
                tj = (t_op[0][Jl], t_op[1][Jl])
                for c in range(2):
                    kc = (k[0][Jl, c], k[1][Jl, c])
                    acc[c] = limb.mul_add_128(acc[c], tj, kc)
            parts = []
            for c in range(2):
                part = limb.barrett_reduce_128(
                    (acc[c][0], acc[c][1]), (acc[c][2], acc[c][3]),
                    ext_mc.q, ext_mc.ratio0, ext_mc.ratio1,
                )
                parts.append(_split21(part))
            s = jax.lax.psum(jnp.stack(parts), axis)
            out = [
                _recombine21_mod(s[c], ext_mc.q, ext_mc.ratio0, ext_mc.ratio1)
                for c in range(2)
            ]
            return (
                jnp.stack([out[0][0], out[1][0]]),
                jnp.stack([out[0][1], out[1][1]]),
            )

        if self._reduce_fn is None:
            rep = P(None, None)
            d1 = P(self.axis, None)
            d2 = P(self.axis, None, None)
            spec_k = P(self.axis, None, None, None)
            d2w = P(self.axis, None, None)
            self._in_specs = (
                (rep, rep),
                (d1, (d2, d2), (d2, d2), (d2, d2),
                 (d2w, d2w), (d2w, d2w)),
                (spec_k, spec_k),
            )
            self._reduce_fn = jax.jit(shard_map(
                body, mesh=self.mesh,
                in_specs=self._in_specs,
                out_specs=(P(None, None, None), P(None, None, None)),
                check_vma=False,
            ))
        plo, phi = self._dispatch(t_coeff, self._stacked, keys_ext)
        return [((plo[0], phi[0])), ((plo[1], phi[1]))]

    def reduce(self, t_coeff, t_ntt, keys_ext):
        """prod[2, L+1, N] (replicated) from coefficient-domain target rows
        [L, N] (+ NTT-form rows for CKKS eye-substitution) and the key
        gathered to the extended base [L, 2, L+1, N]; J sharded over 'tp'."""
        if self.alpha > 1:
            return self._reduce_hybrid(t_coeff, keys_ext)
        L, tp, axis = self.L, self.tp, self.axis
        Lp1 = L + 1
        ext_tables, ext_mc = self.ext_tables, self.ext_mc
        ckks = self.scheme == SchemeType.CKKS
        L_loc = self.d_pad // tp
        if self.d_pad != L:
            pad = self.d_pad - L

            def _pad_rows(pair):
                return tuple(jnp.concatenate(
                    [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
                    for a in pair)

            t_coeff = _pad_rows(t_coeff)
            if t_ntt is not None:
                t_ntt = _pad_rows(t_ntt)

        def body(tc, tn, k):
            n = tc[0].shape[-1]
            # reduce local target rows into every extended row, NTT there
            tt_lo = jnp.broadcast_to(tc[0][:, None, :], (L_loc, Lp1, n))
            tt_hi = jnp.broadcast_to(tc[1][:, None, :], (L_loc, Lp1, n))
            ext_q = tuple(a[None, :, :] for a in ext_mc.q)
            ext_r1 = tuple(a[None, :, :] for a in ext_mc.ratio1)
            reduced = limb.barrett_reduce_64((tt_lo, tt_hi), ext_q, ext_r1)
            t_op = ntt_mod.ntt_forward(reduced, ext_tables)
            if ckks:
                # rows where I == global J are already NTT-form in the input
                gJ = jax.lax.axis_index(axis) * L_loc + jnp.arange(L_loc)
                eye = gJ[:, None] == jnp.arange(Lp1)[None, :]
                o_lo = jnp.broadcast_to(tn[0][:, None, :], (L_loc, Lp1, n))
                o_hi = jnp.broadcast_to(tn[1][:, None, :], (L_loc, Lp1, n))
                t_op = (
                    jnp.where(eye[:, :, None], o_lo, t_op[0]),
                    jnp.where(eye[:, :, None], o_hi, t_op[1]),
                )
            # local inner product over this shard's J rows (128-bit lazy)
            acc = [
                tuple(jnp.zeros((Lp1, n), dtype=jnp.uint32) for _ in range(4))
                for _ in range(2)
            ]
            for Jl in range(L_loc):
                tj = (t_op[0][Jl], t_op[1][Jl])
                for c in range(2):
                    kc = (k[0][Jl, c], k[1][Jl, c])
                    acc[c] = limb.mul_add_128(acc[c], tj, kc)
            parts = []
            for c in range(2):
                part = limb.barrett_reduce_128(
                    (acc[c][0], acc[c][1]), (acc[c][2], acc[c][3]),
                    ext_mc.q, ext_mc.ratio0, ext_mc.ratio1,
                )
                parts.append(_split21(part))
            # ONE exact collective: psum of 21-bit limb splits over 'tp'
            s = jax.lax.psum(jnp.stack(parts), axis)     # [2, 3, Lp1, n]
            out = [
                _recombine21_mod(s[c], ext_mc.q, ext_mc.ratio0, ext_mc.ratio1)
                for c in range(2)
            ]
            return (
                jnp.stack([out[0][0], out[1][0]]),
                jnp.stack([out[0][1], out[1][1]]),
            )

        if self._reduce_fn is None:
            spec_t = P(self.axis, None)
            spec_k = P(self.axis, None, None, None)
            self._in_specs = (
                (spec_t, spec_t),
                (spec_t, spec_t),
                (spec_k, spec_k),
            )
            # shard_map MUST be jitted: eager shard_map dispatches op-by-op
            # across the mesh and is catastrophically slow
            self._reduce_fn = jax.jit(shard_map(
                body, mesh=self.mesh,
                in_specs=self._in_specs,
                out_specs=(P(None, None, None), P(None, None, None)),
                check_vma=False,
            ))
        if t_ntt is None:
            t_ntt = t_coeff
        plo, phi = self._dispatch(t_coeff, t_ntt, keys_ext)
        return [((plo[0], phi[0])), ((plo[1], phi[1]))]

    def _hoisted_fn(self, k: int):
        """Compiled shard_map for a k-rotation hoisted batch (VERDICT r3
        item 2 / BASELINE config #4): the shared decompose runs ONCE per
        shard on its local digit rows, each rotation contracts those rows
        against its own (pre-permuted, digit-sharded) key tensor, and the
        whole batch ends in ONE exact psum of stacked 21-bit limb splits —
        [k, 2, 3, I, n] in a single collective. The per-rotation coefficient
        permutation rides on the keys (evaluator._permuted_keys) and on the
        output polys, both along the unsharded N axis, so the digit sharding
        is untouched. Bit-identical to the single-chip rotate_batch_hoisted."""
        hit = self._hoisted_fns.get(k)
        if hit is not None:
            return hit
        tp, axis = self.tp, self.axis
        I = self.L + self.alpha
        ext_tables, ext_mc = self.ext_tables, self.ext_mc
        d_loc = self.d_pad // tp
        hybrid = self.alpha > 1
        L, Lp1 = self.L, self.L + 1
        ckks = self.scheme == SchemeType.CKKS

        def contract_all(t_op, kall, n):
            parts = []
            for r in range(k):
                acc = [
                    tuple(jnp.zeros((I, n), dtype=jnp.uint32)
                          for _ in range(4))
                    for _ in range(2)
                ]
                for Jl in range(d_loc):
                    tj = (t_op[0][Jl], t_op[1][Jl])
                    for c in range(2):
                        kc = (kall[0][r, Jl, c], kall[1][r, Jl, c])
                        acc[c] = limb.mul_add_128(acc[c], tj, kc)
                for c in range(2):
                    part = limb.barrett_reduce_128(
                        (acc[c][0], acc[c][1]), (acc[c][2], acc[c][3]),
                        ext_mc.q, ext_mc.ratio0, ext_mc.ratio1,
                    )
                    parts.append(_split21(part))
            # ONE collective for the whole rotation batch
            s = jax.lax.psum(jnp.stack(parts), axis)   # [2k, 3, I, n]
            lo = []
            hi = []
            for r in range(k):
                for c in range(2):
                    o = _recombine21_mod(
                        s[2 * r + c], ext_mc.q, ext_mc.ratio0, ext_mc.ratio1)
                    lo.append(o[0])
                    hi.append(o[1])
            return (jnp.stack(lo).reshape(k, 2, I, -1),
                    jnp.stack(hi).reshape(k, 2, I, -1))

        if hybrid:
            from seal_tpu.ops import hybrid_keyswitch as hyb

            def body(tc, stacked, kall):
                rows_idx, iop, iqt, qd, he, hqt = stacked
                y = hyb.decompose_digits(
                    tc, rows_idx, iop, iqt, qd, he, hqt, ext_mc)
                t_op = ntt_mod.ntt_forward(y, ext_tables)
                return contract_all(t_op, kall, tc[0].shape[-1])

            rep = P(None, None)
            d1 = P(axis, None)
            d2 = P(axis, None, None)
            d2w = P(axis, None, None)
            spec_kall = P(None, axis, None, None, None)
            in_specs = (
                (rep, rep),
                (d1, (d2, d2), (d2, d2), (d2, d2), (d2w, d2w), (d2w, d2w)),
                (spec_kall, spec_kall),
            )
        else:

            def body(tc, tn, kall):
                n = tc[0].shape[-1]
                tt_lo = jnp.broadcast_to(tc[0][:, None, :], (d_loc, Lp1, n))
                tt_hi = jnp.broadcast_to(tc[1][:, None, :], (d_loc, Lp1, n))
                ext_q = tuple(a[None, :, :] for a in ext_mc.q)
                ext_r1 = tuple(a[None, :, :] for a in ext_mc.ratio1)
                reduced = limb.barrett_reduce_64((tt_lo, tt_hi), ext_q, ext_r1)
                t_op = ntt_mod.ntt_forward(reduced, ext_tables)
                if ckks:
                    gJ = jax.lax.axis_index(axis) * d_loc + jnp.arange(d_loc)
                    eye = gJ[:, None] == jnp.arange(Lp1)[None, :]
                    o_lo = jnp.broadcast_to(tn[0][:, None, :], (d_loc, Lp1, n))
                    o_hi = jnp.broadcast_to(tn[1][:, None, :], (d_loc, Lp1, n))
                    t_op = (
                        jnp.where(eye[:, :, None], o_lo, t_op[0]),
                        jnp.where(eye[:, :, None], o_hi, t_op[1]),
                    )
                return contract_all(t_op, kall, n)

            spec_t = P(axis, None)
            spec_kall = P(None, axis, None, None, None)
            in_specs = (
                (spec_t, spec_t),
                (spec_t, spec_t),
                (spec_kall, spec_kall),
            )

        fn = jax.jit(shard_map(
            body, mesh=self.mesh, in_specs=in_specs,
            out_specs=(P(None, None, None, None), P(None, None, None, None)),
            check_vma=False,
        ))
        self._hoisted_fns[k] = (fn, in_specs)
        return self._hoisted_fns[k]

    def hoisted_prod_rows(self, target, keys_list):
        """k per-rotation prod rows from ONE shared sharded decompose:
        the TP replacement for rotate_batch_hoisted's per-rotation
        _switch_key_reduce calls. keys_list holds the PRE-PERMUTED key
        tensors [decomp, 2, L_key, N]; returns one [2][(I, n) pair] per key
        (feeds Evaluator._switch_key_tail)."""
        k = len(keys_list)
        if self.scheme == SchemeType.CKKS:
            t_ntt = target
            t_coeff = ntt_mod.ntt_inverse(target, self.cd.ntt_tables)
        else:
            t_ntt = None
            t_coeff = target
        gathered = [self.gather_keys(kt) for kt in keys_list]
        kall = (jnp.stack([g[0] for g in gathered]),
                jnp.stack([g[1] for g in gathered]))   # [k, d_pad, 2, I, n]
        fn, in_specs = self._hoisted_fn(k)
        if self.alpha > 1:
            plo, phi = self._dispatch(t_coeff, self._stacked, kall,
                                      fn=fn, in_specs=in_specs)
        else:
            if self.d_pad != self.L:
                pad = self.d_pad - self.L

                def _pad_rows(pair):
                    return tuple(jnp.concatenate(
                        [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
                        for a in pair)

                t_coeff = _pad_rows(t_coeff)
                t_ntt = _pad_rows(t_ntt) if t_ntt is not None else None
            if t_ntt is None:
                t_ntt = t_coeff
            plo, phi = self._dispatch(t_coeff, t_ntt, kall,
                                      fn=fn, in_specs=in_specs)
        return [
            [(plo[r, 0], phi[r, 0]), (plo[r, 1], phi[r, 1])]
            for r in range(k)
        ]

    # -- Evaluator-compatible entry points --------------------------------------

    def gather_keys(self, keys_tensor):
        """[decomp, 2, L_key, N] → extended-base rows [d_pad, 2, L+α, N]
        (zero rows pad the decomposition axis to the mesh multiple)."""
        idx = jnp.asarray(self.key_indices)
        k = (keys_tensor[0][:self.decomp, :, idx, :],
             keys_tensor[1][:self.decomp, :, idx, :])
        if self.d_pad != self.decomp:
            pad = self.d_pad - self.decomp
            k = tuple(jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)]) for a in k)
        return k

    def prod_rows(self, target, keys_tensor):
        """Decompose locally per shard and contract with one psum: the TP
        replacement for Evaluator._switch_key_prod — feeds either the
        standard special-prime tail or the fused relinearize_rescale tail."""
        if self.scheme == SchemeType.CKKS:
            t_ntt = target
            t_coeff = ntt_mod.ntt_inverse(target, self.cd.ntt_tables)
        else:
            t_ntt = None
            t_coeff = target
        return self.reduce(t_coeff, t_ntt, self.gather_keys(keys_tensor))

    def switch_key(self, ev, ct: Ciphertext, target, keys_tensor) -> Ciphertext:
        """Drop-in TP replacement for Evaluator._switch_key: decompose
        locally per shard, contract with one psum, reuse the single-chip
        special-prime tail — bit-identical output."""
        return ev._switch_key_tail(ct, self.prod_rows(target, keys_tensor))


class TPEvaluator(Evaluator):
    """Drop-in tensor-parallel Evaluator (SURVEY §2.11 TP row).

    The single override point is `_switch_key_prod` — the only
    collective-bearing computation in the whole op surface
    (evaluator.cpp:2382-2677) — which routes through `TPKeySwitch`, so

      * relinearize / apply_galois / rotate_rows / rotate_columns /
        rotate_vector / complex_conjugate read the (large) key tensor
        1/tp per chip and contract with ONE exact psum over tower shards;
      * multiply / add / rescale / mod-switch / plain ops are per-tower-row
        local and run exactly as the stock Evaluator (XLA partitions them
        when the operand arrays carry a sharding);
      * outputs are bit-identical to the single-chip Evaluator
        (tests/test_tp_keyswitch.py).

    Levels whose decomposition-axis length is not divisible by the tp mesh
    size are ZERO-PADDED up to the mesh multiple (padded key rows contract
    to exact zeros), so every chain level runs sharded with the same one
    psum — a depth-k pipeline keeps the TP contraction at L, L-1, ..., 1
    (tests/test_tp_keyswitch.py::test_tp_every_chain_level). Hoisted
    rotation batches (`rotate_batch_hoisted`, BASELINE config #4) also run
    sharded (r4): the shared decompose happens per shard on its local digit
    rows inside one shard_map, each rotation contracts against its own
    pre-permuted digit-sharded key, and the whole batch pays ONE psum —
    the per-rotation coefficient permutations ride the unsharded N axis.
    """

    def __init__(self, context, mesh: Mesh, tp_axis: str = "tp"):
        super().__init__(context)
        self.mesh = mesh
        self.tp_axis = tp_axis
        self._tks_cache: dict = {}

    def _tks_for(self, parms_id):
        key = tuple(parms_id)
        if key not in self._tks_cache:
            # every level shards: TPKeySwitch zero-pads the decomposition
            # axis to the mesh multiple when it does not divide (r3)
            self._tks_cache[key] = TPKeySwitch(
                self.context, parms_id, self.mesh, self.tp_axis)
        return self._tks_cache[key]

    def _switch_key_prod(self, ct: Ciphertext, target, keys_tensor,
                         keys_quot=None):
        # overriding the prod half (rather than _switch_key) lets BOTH the
        # standard tail and the fused relinearize_rescale tail ride the
        # TP-sharded contraction (keys_quot — the single-chip Shoup-route
        # cache — is unused here: the sharded contraction splits each
        # product into 21-bit limb partials for its exact psum)
        tks = self._tks_for(ct.parms_id)
        if tks is None:
            return super()._switch_key_prod(ct, target, keys_tensor,
                                            keys_quot=keys_quot)
        return tks.prod_rows(target, keys_tensor)

    def rotate_batch_hoisted(self, ct: Ciphertext, steps, galois_keys):
        """TP-sharded hoisted rotation batch: one shared sharded decompose,
        k digit-sharded contractions, ONE psum (TPKeySwitch.hoisted_prod_
        rows). The special-prime tail and the output permutation run
        replicated, exactly as the single-chip path — outputs are
        bit-identical to Evaluator.rotate_batch_hoisted."""
        if ct.size != 2:
            raise ValueError("encrypted size must be 2")
        cd = self._cd(ct)
        gt = cd.galois_tool
        mc = cd.mod_consts
        elts = [gt.get_elt_from_step(s) for s in steps]
        for s, e in zip(steps, elts):
            if s != 0 and not galois_keys.has_key(e):
                raise ValueError(f"Galois key for step {s} not present")
        live = [(s, e) for s, e in zip(steps, elts) if s != 0]
        if not live:
            return [ct.copy() for _ in steps]

        tks = self._tks_for(ct.parms_id)
        keys_list = [self._permuted_keys(galois_keys, e, gt) for _, e in live]
        prods = tks.hoisted_prod_rows(ct.poly(1), keys_list)
        c0 = ct.poly(0)
        by_step = {}
        for (s, elt), prod in zip(live, prods):
            delta = self._switch_key_tail(ct, prod)
            out = ct.copy()
            if ct.is_ntt_form:
                out0 = gt.apply_galois_ntt(
                    modring.add_poly(c0, delta.poly(0), mc), elt)
                out1 = gt.apply_galois_ntt(delta.poly(1), elt)
            else:
                out0 = gt.apply_galois(
                    modring.add_poly(c0, delta.poly(0), mc), elt, mc)
                out1 = gt.apply_galois(delta.poly(1), elt, mc)
            out.data = stack_polys([out0, out1])
            by_step[s] = out
        return [by_step[s] if s != 0 else ct.copy() for s in steps]


def tp_relinearize(ev, ct: Ciphertext, relin_keys, mesh: Mesh,
                   tp_axis: str = "tp") -> Ciphertext:
    """Relinearize a size-3 ciphertext with the TP keyswitch
    (parity: evaluator.cpp:1104-1159 + the §2.11 TP design)."""
    if ct.size != 3:
        raise ValueError("tp_relinearize expects a size-3 ciphertext")
    tks = TPKeySwitch(ev.context, ct.parms_id, mesh, tp_axis)
    delta = tks.switch_key(ev, ct, ct.poly(2), relin_keys.key(2))
    cd = ev.context.get_context_data(ct.parms_id)
    mc = cd.mod_consts
    base = Ciphertext(
        (ct.data[0][:2], ct.data[1][:2]), ct.parms_id, ct.is_ntt_form,
        ct.scale, ct.correction_factor)
    c0 = modring.add_poly(base.poly(0), delta.poly(0), mc)
    c1 = modring.add_poly(base.poly(1), delta.poly(1), mc)
    base.data = stack_polys([c0, c1])
    return base
