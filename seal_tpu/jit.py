"""JitEvaluator: the Evaluator with per-op compiled-function caching.

SURVEY.md §7 hard part 4: the modulus chain changes L per level and the
ciphertext size changes on multiply, so one compiled program cannot serve
every call — SEAL never faces this because it interprets loop nests
(evaluator.cpp dispatches per call). Here every op is wrapped in jax.jit;
the cache key is (op name, static argument signature), and jax itself
retraces per (parms_id, size, shapes) because Ciphertext metadata is static
pytree aux data (dtypes.py _ct_flatten).

Key-switching keys are passed as *dynamic* pytree arguments (their device
tensors are inputs, not baked-in constants), so one compiled relinearize
serves any relin-keys value of the same shape.
"""

from __future__ import annotations

import jax

from seal_tpu.context import SEALContext
from seal_tpu.dtypes import Ciphertext, KSwitchKeys, Plaintext
from seal_tpu.evaluator import Evaluator

_DYN = 0      # Ciphertext / Plaintext: dynamic pytree arg
_KEYS = 1     # KSwitchKeys subclass: tensors dynamic, class + parms_id static
_STATIC = 2   # anything else: part of the cache key, closed over


class JitEvaluator:
    """Evaluator facade whose methods run as cached jit-compiled programs.

    Usage:
        jev = JitEvaluator(context)
        ct3 = jev.multiply(ct1, ct2)
        ct3 = jev.relinearize(ct3, relin_keys)

    Any public Evaluator method is available. Compilation happens on first
    use per (op, level, size, key shapes) and is reused afterwards.
    """

    def __init__(self, context: SEALContext):
        self.evaluator = Evaluator(context)
        self.context = context
        self._cache: dict = {}

    def __getattr__(self, name: str):
        if name.startswith("_"):
            raise AttributeError(name)
        method = getattr(self.evaluator, name)
        if not callable(method):
            return method

        def call(*args):
            if name.endswith("_inplace"):
                # run the functional twin through the jit cache, then rebind
                # eagerly — mutating a ciphertext inside a trace would not
                # persist (see Evaluator's _inplace compat wrappers)
                out = self._dispatch(name[: -len("_inplace")], args)
                if out is not args[0]:  # no-op paths return the input itself
                    args[0].__dict__.clear()
                    args[0].__dict__.update(out.__dict__)
                return args[0]
            return self._dispatch(name, args)

        call.__name__ = name
        return call

    def _dispatch(self, name: str, args):
        # Plaintext-taking ops run eagerly: BFV/BGV plaintexts hold host
        # uint64 coefficient vectors that are not jit-traceable leaves (and
        # plain ops are cheap relative to ciphertext ops).
        if any(isinstance(a, Plaintext) for a in args):
            return getattr(self.evaluator, name)(*args)
        if name == "rotate_batch_hoisted":
            self._warm_perm_cache(args)
        spec = []
        dyn = []
        statics = []
        key_parts = [name]
        for a in args:
            if isinstance(a, (Ciphertext, Plaintext)):
                spec.append(_DYN)
                dyn.append(a)
            elif isinstance(a, KSwitchKeys):
                spec.append(_KEYS)
                # key tensors AND the pre-permuted rotation cache ride as
                # dynamic pytree args (device parameters, not baked-in
                # constants); the cache is warmed eagerly above so traced
                # rotations reuse concrete pre-permuted keys
                dyn.append((a.keys, getattr(a, "_perm_cache", {})))
                statics.append((type(a), tuple(a.parms_id)))
                key_parts.append(("keys", type(a).__name__, tuple(a.parms_id),
                                  tuple(sorted(getattr(a, "_perm_cache", {})))))
            elif isinstance(a, list) and a and isinstance(a[0], Ciphertext):
                # e.g. add_many / multiply_many inputs
                spec.append(_DYN)
                dyn.append(a)
            else:
                spec.append(_STATIC)
                v = tuple(a) if isinstance(a, (list, tuple)) else a
                statics.append(v)
                key_parts.append(("static", v))
        key = tuple(key_parts)
        fn = self._cache.get(key)
        if fn is None:
            method = getattr(self.evaluator, name)
            spec_t = tuple(spec)
            statics_t = tuple(statics)

            def wrapped(dyn_args):
                it_d = iter(dyn_args)
                it_s = iter(statics_t)
                full = []
                for kind in spec_t:
                    if kind == _DYN:
                        full.append(next(it_d))
                    elif kind == _KEYS:
                        cls, parms_id = next(it_s)
                        k = cls()
                        k.keys, k._perm_cache = next(it_d)
                        k.parms_id = parms_id
                        full.append(k)
                    else:
                        full.append(next(it_s))
                return method(*full)

            fn = jax.jit(wrapped)
            self._cache[key] = fn
        return fn(tuple(dyn))

    def _warm_perm_cache(self, args):
        """Eagerly pre-permute galois keys for rotate_batch_hoisted so the
        traced program gathers the small output, not the big key tensors."""
        ct = args[0]
        steps = args[1]
        gks = [a for a in args if isinstance(a, KSwitchKeys)]
        if not gks:
            return
        gk = gks[0]
        cd = self.context.get_context_data(ct.parms_id)
        if cd is None:
            return
        gt = cd.galois_tool
        for s in steps:
            if s == 0:
                continue
            elt = gt.get_elt_from_step(s)
            if gk.has_key(elt):
                self.evaluator._permuted_keys(gk, elt, gt)

    def cache_size(self) -> int:
        return len(self._cache)

    def clear_cache(self):
        self._cache.clear()
