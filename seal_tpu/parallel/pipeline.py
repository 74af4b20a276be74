"""Pipeline parallelism (PP) over a 'pp' mesh axis — the HE analogue of
stage-parallel model execution (SURVEY.md §2.11: "stream batches through
mul→relin→rescale stages across mesh slices"). The reference is single-
threaded C++; this is new TPU-first design.

Model: `n_stages` shape-preserving stage functions, stage s resident on
device s of the pp axis. A batch of M microbatches streams through the
systolic schedule: at step t, device s processes microbatch t-s and
ppermutes its result to device s+1. Total steps = M + P - 1; all devices
busy in steady state, and XLA overlaps each step's ppermute with the next
step's compute (async collectives).

For integer-exact HE payloads the pipelined result equals the sequential
composition bit-for-bit (tested on the virtual CPU mesh).

Also provided: `interleave_microbatches`, the single-device variant that
emits all (stage, microbatch) pairs into ONE traced graph so XLA's
scheduler overlaps independent work — the right tool when stages contain
TP collectives that can hide under other microbatches' compute.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def interleave_microbatches(stage_fns, microbatches):
    """Feed each microbatch through all stages inside one traced region.
    Returns outputs in input order. Purely a scheduling aid: results are
    identical to [compose(stage_fns)(x) for x in microbatches]."""
    outs = []
    for x in microbatches:
        for f in stage_fns:
            x = f(x)
        outs.append(x)
    return outs


def pipeline_apply(stage_fns, xs, mesh: Mesh, axis: str = "pp"):
    """Run every microbatch xs[m] through stage_fns[0..P-1] with stage s on
    device s of `axis`, streaming via ppermute.

    stage_fns: P shape-preserving functions (P = mesh.shape[axis]).
    xs: array pytree with a leading microbatch axis of size M (replicated).
    Returns the same pytree with outputs in microbatch order.
    """
    n_stages = len(stage_fns)
    if mesh.shape[axis] != n_stages:
        raise ValueError(
            f"need {n_stages} devices on axis '{axis}', mesh has {mesh.shape[axis]}")
    leaves = jax.tree.leaves(xs)
    M = leaves[0].shape[0]
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def local(xs_local):
        sidx = jax.lax.axis_index(axis)

        def apply_stage(x):
            return jax.lax.switch(sidx, list(stage_fns), x)

        def select_mb(t):
            # device 0 injects microbatch t (clamped during drain)
            mb = jnp.clip(t, 0, M - 1)
            return jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(a, mb, axis=0,
                                                       keepdims=False),
                xs_local)

        def step(t, carry):
            cur, outbuf = carry
            # stage s works on microbatch t - s when 0 <= t-s < M
            incoming = select_mb(t)
            work = jax.tree.map(
                lambda inc, c: jnp.where(sidx == 0, inc, c), incoming, cur)
            done = apply_stage(work)
            # last stage's finished microbatch index
            out_mb = jnp.clip(t - (n_stages - 1), 0, M - 1)
            valid = (t >= n_stages - 1) & (sidx == n_stages - 1)

            def upd(buf, val):
                new = jax.lax.dynamic_update_index_in_dim(
                    buf, val, out_mb, axis=0)
                return jnp.where(valid, new, buf)

            outbuf = jax.tree.map(upd, outbuf, done)
            # hand result to the next stage (wraps around; device 0's
            # incoming is overwritten by fresh injection next step)
            nxt = jax.tree.map(
                lambda a: jax.lax.ppermute(a, axis, perm), done)
            return nxt, outbuf

        # carries become device-varying inside the loop (axis_index,
        # ppermute); mark the initial values as varying over the pp axis
        def varying(x):
            return jax.tree.map(
                lambda a: jax.lax.pcast(a, (axis,), to="varying"), x)

        cur = varying(select_mb(0))
        outbuf = varying(jax.tree.map(lambda a: jnp.zeros_like(a), xs_local))
        _, outbuf = jax.lax.fori_loop(0, M + n_stages - 1, step,
                                      (cur, outbuf))
        # only the last stage filled its buffer; psum of zeros elsewhere
        # replicates the result on every device (exact for integer data)
        return jax.tree.map(lambda a: jax.lax.psum(a, axis), outbuf)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=P(*(None,) * leaves[0].ndim),
        out_specs=P(*(None,) * leaves[0].ndim),
    )
    return fn(xs)


def pipeline_apply_sharded(stage_fns, xs, mesh: Mesh, axis: str = "pp",
                           hlo_out: list | None = None):
    """Systolic pipeline with the microbatch feed SHARDED over the pp axis —
    per-device memory O(M/P + P) instead of the O(M) replication of
    `pipeline_apply` (VERDICT r1 item 8).

    Microbatches are laid out cyclically (mb m lives on device m mod P), so
    a "chunk" of P consecutive microbatches is one `all_gather` away (an
    O(P) transient); finished chunks return to their owners with one
    `psum_scatter`. The schedule is statically unrolled over the
    M + P - 1 systolic steps, keeping every collective unconditional.

    stage_fns: P shape-preserving stage functions (stage s on device s).
    xs: pytree with leading microbatch axis M (M % P == 0).
    Returns the same pytree, microbatch order preserved; for integer HE
    payloads the result is bit-identical to the sequential composition.
    """
    n_stages = len(stage_fns)
    Pn = mesh.shape[axis]
    if Pn != n_stages:
        raise ValueError(
            f"need {n_stages} devices on axis '{axis}', mesh has {Pn}")
    leaves = jax.tree.leaves(xs)
    M = leaves[0].shape[0]
    if M % Pn:
        raise ValueError(f"microbatch count {M} not divisible by {Pn}")
    chunks = M // Pn
    T = M + Pn - 1
    perm = [(i, (i + 1) % Pn) for i in range(Pn)]

    # cyclic layout: local feed slot k on device s holds microbatch k*P + s
    cyc = jax.tree.map(
        lambda a: a.reshape((chunks, Pn) + a.shape[1:])
                   .swapaxes(0, 1)
                   .reshape((M,) + a.shape[1:]),
        xs)

    def local(feed):
        # feed: [chunks, ...] local slice (this device's cyclic microbatches)
        sidx = jax.lax.axis_index(axis)

        def apply_stage(x):
            return jax.lax.switch(sidx, list(stage_fns), x)

        # the sharded feed is already device-varying; so is everything below
        cur = jax.tree.map(lambda a: jnp.zeros_like(a[0]), feed)
        in_chunk = None          # gathered [P, ...] current input chunk
        out_roll = jax.tree.map(
            lambda a: jnp.zeros((Pn,) + a.shape[1:], a.dtype), feed)
        out_slots = []

        for t in range(T):
            if t % Pn == 0 and t < M:
                c = t // Pn
                mine = jax.tree.map(lambda a: a[c], feed)
                in_chunk = jax.tree.map(
                    lambda a: jax.lax.all_gather(a, axis), mine)
            if t < M:
                incoming = jax.tree.map(lambda a: a[t % Pn], in_chunk)
            else:  # drain: inject zeros
                incoming = cur
            work = jax.tree.map(
                lambda inc, c_: jnp.where(sidx == 0, inc, c_), incoming, cur)
            done = apply_stage(work)
            out_mb = t - (Pn - 1)
            if out_mb >= 0:
                # only the last stage's value is real; zero elsewhere so the
                # later psum_scatter is exact
                contrib = jax.tree.map(
                    lambda d: jnp.where(sidx == Pn - 1, d, jnp.zeros_like(d)),
                    done)
                out_roll = jax.tree.map(
                    lambda buf, v: buf.at[out_mb % Pn].set(v),
                    out_roll, contrib)
                if out_mb % Pn == Pn - 1:
                    # chunk complete: return each mb to its cyclic owner
                    scat = jax.tree.map(
                        lambda a: jax.lax.psum_scatter(
                            a, axis, scatter_dimension=0, tiled=True)[0],
                        out_roll)
                    out_slots.append(scat)
                    out_roll = jax.tree.map(
                        lambda a: jnp.zeros_like(a), out_roll)
            cur = jax.tree.map(lambda a: jax.lax.ppermute(a, axis, perm), done)

        return jax.tree.map(lambda *s: jnp.stack(s), *out_slots)

    spec = P(axis, *(None,) * (leaves[0].ndim - 1))
    fn = jax.jit(shard_map(
        local, mesh=mesh, in_specs=spec, out_specs=spec))
    if hlo_out is not None:
        # compiled HLO of the systolic schedule (collective census hook);
        # execute the SAME compiled object — re-calling fn would compile
        # a second time (minutes on a tunneled backend)
        compiled = fn.lower(cyc).compile()
        hlo_out.append(compiled.as_text())
        out_cyc = compiled(cyc)
    else:
        out_cyc = fn(cyc)
    # undo the cyclic layout
    return jax.tree.map(
        lambda a: a.reshape((Pn, chunks) + a.shape[1:])
                   .swapaxes(0, 1)
                   .reshape((M,) + a.shape[1:]),
        out_cyc)
