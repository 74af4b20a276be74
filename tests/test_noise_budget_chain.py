"""Noise-budget-vs-chain-depth parity (VERDICT r4 item 7).

invariant_noise_budget is the user's main BFV observability tool
(decryptor.h:102); the r4 suite pinned it at a single point. This sweep
replays a full n=8192 BFV chain under the fixed PRNG and asserts budget
equality with the reference after EVERY op (golden vectors from
tools/oracle/dump_noise_budget_chain.cpp; examples/3_levels parity).
"""

import json
import pathlib

import numpy as np

from seal_tpu import (
    BatchEncoder,
    CoeffModulus,
    Decryptor,
    EncryptionParameters,
    Encryptor,
    Evaluator,
    KeyGenerator,
    PlainModulus,
    SchemeType,
    SEALContext,
)

VEC = pathlib.Path(__file__).parent / "vectors" / "noise_budget_chain.json"


def test_noise_budget_chain_matches_reference():
    steps = json.loads(VEC.read_text())["steps"]
    parms = EncryptionParameters(SchemeType.BFV)
    parms.set_poly_modulus_degree(8192)
    parms.set_coeff_modulus(CoeffModulus.create(8192, [43, 43, 43, 43, 46]))
    parms.set_plain_modulus(PlainModulus.batching(8192, 20))
    parms.set_random_seed((1, 2, 3, 4, 5, 6, 7, 8))
    ctx = SEALContext(parms)
    kg = KeyGenerator(ctx)
    pk = kg.create_public_key()
    rk = kg.create_relin_keys()
    enc = Encryptor(ctx, pk)
    ev = Evaluator(ctx)
    dec = Decryptor(ctx, kg.secret_key())
    be = BatchEncoder(ctx)
    vals = np.arange(be.slot_count, dtype=np.uint64) % 7
    ct = enc.encrypt(be.encode(vals))

    got = [["fresh", dec.invariant_noise_budget(ct)]]
    while True:
        ct = ev.multiply(ct, ct)
        got.append(["multiply", dec.invariant_noise_budget(ct)])
        ct = ev.relinearize(ct, rk)
        got.append(["relinearize", dec.invariant_noise_budget(ct)])
        cd = ctx.get_context_data(ct.parms_id)
        if cd.next_context_data is None:
            break
        ct = ev.mod_switch_to_next(ct)
        b = dec.invariant_noise_budget(ct)
        got.append(["mod_switch", b])
        if b <= 0:
            break

    assert len(got) == len(steps), (got, steps)
    for (op_g, b_g), (op_r, b_r) in zip(got, steps):
        assert op_g == op_r
        assert b_g == b_r, f"budget mismatch after {op_g}: {b_g} vs {b_r}"
