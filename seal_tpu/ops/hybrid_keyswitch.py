r"""Hybrid (GHS-style) key switching: α-prime digits, α special primes.

The reference implements exactly one key-switching variant — a single
special prime and per-prime decomposition (evaluator.cpp:2382-2677,
keygenerator.cpp:732-765). seal_tpu generalizes it to α ≥ 1 special primes
with ⌈L/α⌉ decomposition digits (the scheme of Gentry-Halevi-Smart /
HEAAN-RNS, standard in OpenFHE and Lattigo): the decompose stage — 60% of
the mult+relin+rescale pipeline on TPU — shrinks from L·(L+1) lifted NTTs
to ⌈L/α⌉·(L+α), and the inner-product contraction from L to ⌈L/α⌉ terms.
α = 1 reproduces the reference's algorithm bit-exactly (it is the same
special case) and remains the default.

Math (why the key factor is just P mod q_i):
  digit j covers key data primes D_j = [jα, (j+1)α); KSK_j = Enc_s(m_j·s')
  where m_j has RNS residues (P mod q_i) for i ∈ D_j and 0 elsewhere, i.e.
  m_j = P·W_j·[W_j⁻¹]_{Q_j} mod QP with Q_j = Π_{i∈D_j} q_i, W_j = Q/Q_j.
  The evaluator decomposes c into y_j = fast-base-extension of
  [c·\hat{Q}'_{j,t}⁻¹]_{q_t} over the level's digit primes T_j = D_j ∩ [0,L);
  then Σ_j y_j·m_j ≡ P·c (mod Q_level) — the extension error k·Q'_j
  annihilates against W_j (k·Q'_j·W_j·P ≡ 0 mod QP restricted to live rows),
  so no centering is needed, exactly as in the reference's α = 1 row trick.
  ModDown divides by P with the same half-P-centered rounding the reference
  applies for its single q_k (evaluator.cpp:2616-2675), via one fast base
  conversion from the α special rows.
"""

from __future__ import annotations

import functools

import numpy as np

from seal_tpu.ops import limb, modring
from seal_tpu.ops import ntt as ntt_mod


def _concrete_lru_cache(fn):
    """lru_cache that refuses to memoize results containing tracers: these
    const builders produce jnp arrays, and a first call from INSIDE a jit
    trace would otherwise poison the cache with DynamicJaxprTracers that
    leak into later eager calls (UnexpectedTracerError)."""
    cache: dict = {}

    @functools.wraps(fn)
    def wrapped(*args):
        if args in cache:
            return cache[args]
        out = fn(*args)
        import jax

        if not any(isinstance(leaf, jax.core.Tracer)
                   for leaf in jax.tree.leaves(out)):
            cache[args] = out
        return out

    return wrapped


def digit_ranges(L: int, alpha: int) -> list[list[int]]:
    """Key-level digit partition restricted to the level's first L primes."""
    return [list(range(j * alpha, min((j + 1) * alpha, L)))
            for j in range(-(-L // alpha))]


@_concrete_lru_cache
def decomp_consts(key_moduli: tuple, alpha: int, L: int):
    """Host constants for the hybrid decompose at a level with L data primes.

    Returns (digits, per_digit) where per_digit[j] =
      (inv_hat_op, inv_hat_qt, q_dig, hat_ext_pair, hat_ext_qt):
      * inv_hat: Shoup pairs of [\\hat{Q}'_{j,t}^{-1}]_{q_t}, shape [a_j, 1]
      * q_dig: u64 pair [a_j, 1] of the digit's own moduli
      * hat_ext_pair/_qt: Shoup pair [a_j, I] of \\hat{Q}'_{j,t} mod
        ext_modulus_i (I = L data + alpha special rows) — the quotient
        feeds the per-term Shoup dot (_shoup_dot)
    """
    K = list(key_moduli[:len(key_moduli) - alpha])
    specials = list(key_moduli[len(key_moduli) - alpha:])
    ext = K[:L] + specials
    digits = digit_ranges(L, alpha)
    per_digit = []
    for rows in digits:
        qd = [K[i] for i in rows]
        Qj = 1
        for q in qd:
            Qj *= q
        hats = [Qj // q for q in qd]
        inv_hats = [pow(h % q, -1, q) for h, q in zip(hats, qd)]
        inv_op, inv_qt = modring.shoup_pair(
            [[v] for v in inv_hats], [[q] for q in qd], shape=(len(qd), 1))
        q_dig = limb.arr_to_u64([[q] for q in qd], shape=(len(qd), 1))
        hat_ext, hat_qt = modring.shoup_pair(
            [[h % m for m in ext] for h in hats],
            [list(ext) for _ in hats], shape=(len(qd), len(ext)))
        per_digit.append((inv_op, inv_qt, q_dig, hat_ext, hat_qt))
    return digits, per_digit


def _shoup_dot(w, hat_op, hat_qt, mc):
    """Σ_t w_t·hat_t mod q, fully reduced — per-term Shoup-lazy products
    + one conditional-subtraction chain instead of 128-bit accumulation +
    Barrett-128 (~1.9x fewer u32 ops at a=2, ~3x at a=1). Bit-identical:
    both routes emit the unique representative of the same integer in
    [0, q). w: pair [a, N] (each row < its q_t); hat: Shoup pair [a, I]
    per OUTPUT modulus; mc: ModConsts of the I output moduli.

    The lazy sum needs 2a·q < 2^64 (q < 2^61): contractions wider than 4
    fall back to the 128-bit accumulation route."""
    import jax.numpy as jnp

    a = w[0].shape[0]
    if a > 4:
        I = mc.q[0].shape[0]
        n = w[0].shape[-1]
        z = jnp.zeros((I, n), jnp.uint32)
        acc = (z, z, z, z)
        for t in range(a):
            wt = (w[0][t][None, :], w[1][t][None, :])
            ht = (hat_op[0][t][:, None], hat_op[1][t][:, None])
            acc = limb.mul_add_128(acc, wt, ht)
        return limb.barrett_reduce_128(
            (acc[0], acc[1]), (acc[2], acc[3]),
            mc.q, mc.ratio0, mc.ratio1)
    acc = None
    for t in range(a):
        wt = (w[0][t][None, :], w[1][t][None, :])
        term = limb.mul_mod_shoup_lazy(
            wt, (hat_op[0][t][:, None], hat_op[1][t][:, None]),
            (hat_qt[0][t][:, None], hat_qt[1][t][:, None]), mc.q)
        acc = term if acc is None else limb.add64(acc, term)
    # acc < 2a·q -> [0, q): subtract 2^k·q top-down
    k = (2 * a - 1).bit_length() - 1
    while k >= 0:
        bound = limb.shl64(mc.q, k) if k else mc.q
        acc = limb.cond_sub(acc, bound)
        k -= 1
    return acc


def _split_tower(key_moduli: tuple, alpha: int, L: int):
    """(K, specials, P): the level's first L data primes, the alpha special
    primes, and their product P — the one tower-layout convention."""
    K = list(key_moduli[:len(key_moduli) - alpha])[:L]
    specials = list(key_moduli[len(key_moduli) - alpha:])
    P = 1
    for p in specials:
        P *= p
    return K, specials, P


@_concrete_lru_cache
def tail_consts(key_moduli: tuple, alpha: int, L: int, t_mod: int):
    """Host constants for the one-shot ModDown-by-P tail.

    t_mod = 0 for BFV/CKKS (half-P centered rounding, the reference's
    qk_half trick generalized); t_mod = plain modulus for BGV (exact
    t-multiple correction, the reference's inv_q_last_mod_t path)."""
    K, specials, P = _split_tower(key_moduli, alpha, L)
    a = alpha
    hats = [P // p for p in specials]
    inv_hats = [pow(h % p, -1, p) for h, p in zip(hats, specials)]
    out = {
        "p_mc": modring.make_mod_consts(specials),
        "inv_hatP_shoup": modring.shoup_pair(
            [[v] for v in inv_hats], [[p] for p in specials], shape=(a, 1)),
        "hatP_q": modring.shoup_pair(
            [[h % q for q in K] for h in hats],
            [list(K) for _ in hats], shape=(a, L)),
        "pinv_q_shoup": modring.shoup_pair(
            [[pow(P % q, -1, q)] for q in K], [[q] for q in K], shape=(L, 1)),
    }
    if t_mod:
        out["hatP_t"] = modring.shoup_pair(
            [[h % t_mod] for h in hats], [[t_mod] for _ in hats],
            shape=(a, 1))
        out["pinv_t_shoup"] = modring.shoup_pair(
            [[pow(P % t_mod, -1, t_mod)]], [[t_mod]], shape=(1, 1))
        out["p_mod_q"] = limb.arr_to_u64([[P % q] for q in K], shape=(L, 1))
    else:
        half = P >> 1
        out["phalf_p"] = limb.arr_to_u64(
            [[half % p] for p in specials], shape=(a, 1))
        out["phalf_q"] = limb.arr_to_u64([[half % q] for q in K], shape=(L, 1))
    return out


@_concrete_lru_cache
def fused_rescale_consts(key_moduli: tuple, alpha: int, L: int):
    """Shoup pairs of (P mod q_i) on the L live data rows.

    Used by the fused relinearize+rescale tail (Evaluator.relinearize_rescale):
    the ciphertext body is lifted into the keyswitch dividend as P·(c0, c1),
    so ONE centered division by P·q_{L-1} replaces the sequential ÷P
    (evaluator.cpp:2616-2675) followed by ÷q_last (evaluator.cpp:1441-1479).
    """
    K, _, P = _split_tower(key_moduli, alpha, L)
    return modring.shoup_pair(
        [[P % q] for q in K], [[q] for q in K], shape=(L, 1))


@_concrete_lru_cache
def decomp_consts_stacked(key_moduli: tuple, alpha: int, L: int):
    """Digit constants stacked along a leading digit axis (uniform width α,
    zero-padded partial digit) — the layout the TP-sharded keyswitch shards
    over its mesh axis. Padding is exact: a padded slot has op = qt =
    hat = 0, so its contribution is identically zero."""
    import jax.numpy as jnp

    digits, per_digit = decomp_consts(key_moduli, alpha, L)
    d = len(digits)
    I = L + alpha
    rows_idx = np.zeros((d, alpha), dtype=np.int32)
    inv_op = [np.zeros((d, alpha, 1), dtype=np.uint32) for _ in range(2)]
    inv_qt = [np.zeros((d, alpha, 1), dtype=np.uint32) for _ in range(2)]
    q_dig = [np.zeros((d, alpha, 1), dtype=np.uint32) for _ in range(2)]
    hat_ext = [np.zeros((d, alpha, I), dtype=np.uint32) for _ in range(2)]
    hat_qt = [np.zeros((d, alpha, I), dtype=np.uint32) for _ in range(2)]
    for j, (rows, (iop, iqt, qd, he, hqt)) in enumerate(
            zip(digits, per_digit)):
        a = len(rows)
        rows_idx[j, :a] = rows
        for h in range(2):
            inv_op[h][j, :a] = np.asarray(iop[h])
            inv_qt[h][j, :a] = np.asarray(iqt[h])
            q_dig[h][j, :a] = np.asarray(qd[h])
            hat_ext[h][j, :a] = np.asarray(he[h])
            hat_qt[h][j, :a] = np.asarray(hqt[h])
    return (jnp.asarray(rows_idx),
            tuple(jnp.asarray(a) for a in inv_op),
            tuple(jnp.asarray(a) for a in inv_qt),
            tuple(jnp.asarray(a) for a in q_dig),
            tuple(jnp.asarray(a) for a in hat_ext),
            tuple(jnp.asarray(a) for a in hat_qt))


def decompose_digits(t_target, rows_idx, inv_op, inv_qt, q_dig, hat_ext,
                     hat_qt, ext_mc):
    """decompose() over an explicit stacked-constants digit block
    [d_loc, α, ...] (possibly a mesh shard of decomp_consts_stacked).
    t_target is the full coeff-domain [L, N] pair (replicated)."""
    import jax.numpy as jnp

    d_loc, a = rows_idx.shape
    outs_lo, outs_hi = [], []
    for jl in range(d_loc):
        idx = rows_idx[jl]
        tr = (t_target[0][idx], t_target[1][idx])            # [α, N]
        w = limb.mul_mod_shoup(
            tr, (inv_op[0][jl], inv_op[1][jl]),
            (inv_qt[0][jl], inv_qt[1][jl]),
            (q_dig[0][jl], q_dig[1][jl]))                    # [α, N]
        y = _shoup_dot(
            w, (hat_ext[0][jl], hat_ext[1][jl]),
            (hat_qt[0][jl], hat_qt[1][jl]), ext_mc)
        outs_lo.append(y[0])
        outs_hi.append(y[1])
    return jnp.stack(outs_lo), jnp.stack(outs_hi)            # [d_loc, I, N]


def decompose(t_target, key_moduli: tuple, alpha: int, L: int, ext_mc):
    r"""Coeff-domain target [L, N] → digit rows [d, I, N] (pre-NTT).

    y_j[i] = Σ_{t∈T_j} (t_t·[\hat{Q}'_{j,t}^{-1}]_{q_t} mod q_t)·
             (\hat{Q}'_{j,t} mod q_i), one Barrett-128 per row — the
    α-digit analogue of evaluator.cpp:2489-2514's per-prime reduction."""
    import jax.numpy as jnp

    digits, per_digit = decomp_consts(key_moduli, alpha, L)
    outs_lo, outs_hi = [], []
    for rows, (inv_op, inv_qt, q_dig, hat_ext, hat_qt) in zip(
            digits, per_digit):
        idx = jnp.asarray(rows)
        tr = (t_target[0][idx], t_target[1][idx])            # [a, N]
        w = limb.mul_mod_shoup(tr, inv_op, inv_qt, q_dig)    # [a, N], < q_t
        y = _shoup_dot(w, hat_ext, hat_qt, ext_mc)           # [I, N]
        outs_lo.append(y[0])
        outs_hi.append(y[1])
    return jnp.stack(outs_lo), jnp.stack(outs_hi)            # [d, I, N]


def diag_skip_ntt(rows, target, ext_tables, L: int, n_special: int, dig_of):
    """Forward-NTT decompose rows [d, L+n_special, N] with the CKKS diagonal
    skip: at digit j = dig_of[i], row i of the decomposition equals the
    coefficient-domain target row i EXACTLY (every other digit term vanishes
    mod q_i), so the already-NTT-form `target` row i is substituted instead
    of transformed — d·(L+n_special) − L forward rows instead of all of
    them. Bit-identical to the compute-then-overwrite form
    (tests/test_evaluator_extra.py TestDiagonalSkipDecompose). dig_of[i] = i
    with d = L reproduces the reference's α=1 eye shortcut
    (evaluator.cpp:2488-2496); dig_of[i] = i//α is the hybrid digit map."""
    import jax.numpy as jnp

    from seal_tpu.ops import ntt as ntt_mod

    d = rows[0].shape[0]
    n = rows[0].shape[-1]
    ts = ntt_mod.ntt_forward(
        (rows[0][:, L:, :], rows[1][:, L:, :]),
        ntt_mod.slice_tables(ext_tables, L, L + n_special))  # [d, n_special, N]
    if d > 1:
        jidx = jnp.asarray(
            [[j for j in range(d) if j != dig_of[i]]
             for i in range(L)]).T                           # [d-1, L]
        body_in = tuple(
            jnp.take_along_axis(a[:, :L, :], jidx[:, :, None], axis=0)
            for a in rows)                                   # [d-1, L, N]
        body = ntt_mod.ntt_forward(
            body_in, ntt_mod.slice_tables(ext_tables, 0, L))
        # scatter back: out[j, i<L] = target[i] if dig_of[i]==j else
        # body[k, i] with k = j if j < dig_of[i] else j-1
        k_idx = jnp.asarray(
            [[j if j < dig_of[i] else max(j - 1, 0) for i in range(L)]
             for j in range(d)])                             # [d, L]
        lvl = tuple(
            jnp.take_along_axis(b, k_idx[:, :, None], axis=0)
            for b in body)                                   # [d, L, N]
    else:
        lvl = tuple(jnp.zeros((d, L, n), jnp.uint32) for _ in range(2))
    eye = jnp.asarray([[dig_of[i] == j for i in range(L)] for j in range(d)])
    orig_lo = jnp.broadcast_to(target[0][None, :, :], (d, L, n))
    orig_hi = jnp.broadcast_to(target[1][None, :, :], (d, L, n))
    return (
        jnp.concatenate(
            [jnp.where(eye[:, :, None], orig_lo, lvl[0]), ts[0]], axis=1),
        jnp.concatenate(
            [jnp.where(eye[:, :, None], orig_hi, lvl[1]), ts[1]], axis=1),
    )


def mod_down(rows, scheme_is_bgv: bool, key_moduli: tuple, alpha: int, L: int,
             t_mod: int, lvl_tables, special_tables, mc, is_ntt_out: bool,
             rows_ntt: bool = True):
    """Divide a key-level poly [L+α, N] by P = Π specials.

    rows arrive in NTT domain when rows_ntt (the keyswitch inner product)
    or coefficient domain otherwise (encrypt-at-lower-level zero
    encryptions). Returns [L, N] in NTT domain if is_ntt_out (CKKS) else
    coefficient domain (BFV/BGV) — mirroring the reference's single-special
    tail (evaluator.cpp:2572-2676) with one fast base conversion replacing
    the single-row Barrett lift."""
    import jax.numpy as jnp

    c = tail_consts(key_moduli, alpha, L, t_mod if scheme_is_bgv else 0)
    spec = (rows[0][L:], rows[1][L:])                        # [α, N]
    if rows_ntt:
        spec = ntt_mod.ntt_inverse(spec, special_tables)     # coeff, < p_k
    p_mc = c["p_mc"]
    inv_op, inv_qt = c["inv_hatP_shoup"]

    if scheme_is_bgv:
        w = limb.mul_mod_shoup(spec, inv_op, inv_qt, p_mc.q)
    else:
        y = limb.add_mod(spec, c["phalf_p"], p_mc.q)
        w = limb.mul_mod_shoup(y, inv_op, inv_qt, p_mc.q)    # [α, N]

    hq_op, hq_qt = c["hatP_q"]
    r = _shoup_dot(w, hq_op, hq_qt, mc)                      # [L, N]

    pinv_op, pinv_qt = c["pinv_q_shoup"]
    if scheme_is_bgv:
        # y_t = Σ w_k·(hatP_k mod t): the SAME integer the q-rows carry,
        # reduced mod t — makes the numerator ≡ x (mod t) exactly
        t_mc = modring.make_mod_consts([t_mod])
        ht_op, ht_qt = c["hatP_t"]
        y_t = _shoup_dot(w, ht_op, ht_qt, t_mc)              # [1, N]
        k_t = limb.neg_mod(y_t, t_mc.q)
        pt_op, pt_qt = c["pinv_t_shoup"]
        k_t = limb.mul_mod_shoup(k_t, pt_op, pt_qt, t_mc.q)
        k_q = limb.barrett_reduce_64(k_t, mc.q, mc.ratio1)
        delta = limb.mul_mod(k_q, c["p_mod_q"], mc.q, mc.ratio0, mc.ratio1)
        body = (rows[0][:L], rows[1][:L])
        if rows_ntt:
            body = ntt_mod.ntt_inverse(body, lvl_tables)
        summed = limb.add64(
            body, limb.sub64(limb.sub64(mc.two_q, delta), r))
        return limb.mul_mod_shoup(summed, pinv_op, pinv_qt, mc.q)

    fix = limb.sub64(mc.q, c["phalf_q"])
    r = limb.add64(r, fix)                                   # < 2q
    body = (rows[0][:L], rows[1][:L])
    if is_ntt_out:
        r = ntt_mod.ntt_forward(r, lvl_tables, lazy=True)    # < 4q
    elif rows_ntt:
        body = ntt_mod.ntt_inverse(body, lvl_tables, lazy=True)
    qi_lazy = limb.shl64(mc.q, 2)
    summed = limb.sub64(limb.add64(body, qi_lazy), r)
    return limb.mul_mod_shoup(summed, pinv_op, pinv_qt, mc.q)
