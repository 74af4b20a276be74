"""Streaming a large ciphertext batch through the flagship pipeline —
BASELINE config #5's shape as USER code (r4; no reference equivalent).

The pattern: encode/encrypt a stream of plaintext vectors on the host,
feed them to the device in B-sized chunks, run one jitted
multiply + relinearize + rescale step per chunk (independent dispatches —
the chunks overlap in the device queue), then drain with a single
combined probe before decrypting. The same structure measured 1062 ops/s
per chip at n=16384 on real hardware (tools/bench_sustained.py,
BASELINE.md "Sustained streaming"); this example runs a small shape so it
executes anywhere.
"""

import jax
import jax.numpy as jnp
import numpy as np

from seal_tpu import (
    CoeffModulus, Decryptor, EncryptionParameters, Encryptor, Evaluator,
    KeyGenerator, SEALContext, SecLevelType,
)
from seal_tpu.encryption_params import SchemeType
from seal_tpu.ckks import CKKSEncoder


def main(n=2048, total=32, B=8):
    parms = EncryptionParameters(SchemeType.CKKS)
    parms.set_poly_modulus_degree(n)
    parms.set_coeff_modulus(CoeffModulus.create(n, [40, 28, 40]))
    parms.set_special_modulus_size(1)
    ctx = SEALContext(parms, sec_level=SecLevelType.NONE)
    kg = KeyGenerator(ctx)
    enc = Encryptor(ctx, kg.create_public_key())
    dec = Decryptor(ctx, kg.secret_key())
    ev = Evaluator(ctx)
    encoder = CKKSEncoder(ctx)
    scale = 2.0 ** 28

    # host-side stream of inputs (each chunk: B ciphertext pairs)
    rng = np.random.default_rng(0)
    inputs = rng.uniform(-1, 1, (total, encoder.slot_count))
    weights = np.linspace(0.5, 1.5, encoder.slot_count)
    ct_w = enc.encrypt(encoder.encode(weights, scale))

    # the per-chunk step: vmapped multiply + relinearize + rescale
    rk = kg.create_relin_keys()

    def one(x_pair):
        ca = ct_w.copy()
        ca.data = x_pair
        return ev.rescale_to_next(ev.relinearize(ev.multiply(ca, ct_w), rk)).data

    # production recipe (BASELINE "sustained"): large chunks with lax.map
    # over vmap SUB-batches — per-sub-batch temps stay at the saturation
    # sweet spot while the dispatch count drops (measured 1115 ops/s at
    # B=64/submap=16 vs 1062 flat-B=16 on real hardware)
    submap = B // 2

    def stepped(x_pair):
        g = B // submap
        xr = tuple(a.reshape((g, submap) + a.shape[1:]) for a in x_pair)
        lo, hi = jax.lax.map(jax.vmap(one), xr)
        return (lo.reshape((B,) + lo.shape[2:]),
                hi.reshape((B,) + hi.shape[2:]))

    step = jax.jit(stepped)

    outs = []
    for c in range(0, total, B):
        chunk = [enc.encrypt(encoder.encode(v, scale)) for v in inputs[c:c + B]]
        x = (jnp.stack([ct.data[0] for ct in chunk]),
             jnp.stack([ct.data[1] for ct in chunk]))
        outs.append(step(x))               # independent dispatch per chunk
    # drain: one combined device op forces completion of the whole stream
    probe = jnp.stack([o[0][0, 0, 0, 0] for o in outs])
    np.asarray(probe)

    # decrypt a few results and check them
    proto = ev.rescale_to_next(ev.relinearize(ev.multiply(ct_w, ct_w), rk))
    for k in (0, total - 1):
        o = outs[k // B]
        i = k % B
        ct = proto.copy()
        ct.data = (o[0][i], o[1][i])
        got = encoder.decode(dec.decrypt(ct))
        want = inputs[k] * weights
        assert np.max(np.abs(got - want)) < 1e-3, np.max(np.abs(got - want))
    print(f"streamed {total} ciphertexts in {total // B} chunks of {B}: "
          "products verified")
    print("13_streaming_pipeline OK")


if __name__ == "__main__":
    main()
