"""Validity checks for scheme objects against a context.

Parity: seal::valcheck (/root/reference/native/src/seal/valcheck.{h,cpp}:
31-162): layered checks — metadata (parms_id in the chain, sizes), buffer
(allocation shapes), data (coefficients < modulus) — composed into
is_valid_for. Cheap host asserts; the data check pulls to host and is meant
for untrusted deserialized inputs, not the hot path.
"""

from __future__ import annotations

import numpy as np

from seal_tpu.context import SEALContext
from seal_tpu.dtypes import Ciphertext, KSwitchKeys, Plaintext, PublicKey, SecretKey
from seal_tpu.encryption_params import PARMS_ID_ZERO, SchemeType
from seal_tpu.modulus import CIPHERTEXT_SIZE_MAX, CIPHERTEXT_SIZE_MIN


def is_metadata_valid_for(obj, context: SEALContext, allow_pure_key_levels: bool = False) -> bool:
    if isinstance(obj, Ciphertext):
        cd = context.get_context_data(obj.parms_id)
        if cd is None:
            return False
        if not allow_pure_key_levels and tuple(obj.parms_id) == tuple(context.key_parms_id) \
                and context.using_keyswitching:
            return False
        if obj.size < CIPHERTEXT_SIZE_MIN or obj.size > CIPHERTEXT_SIZE_MAX:
            return False
        return (
            obj.coeff_modulus_size == cd.coeff_modulus_size
            and obj.poly_modulus_degree == cd.parms.poly_modulus_degree
        )
    if isinstance(obj, Plaintext):
        if obj.rns_data is not None:
            cd = context.get_context_data(obj.parms_id)
            if cd is None:
                return False
            return obj.rns_data[0].shape == (
                cd.coeff_modulus_size, cd.parms.poly_modulus_degree
            )
        first = context.first_context_data()
        return len(obj.data) <= first.parms.poly_modulus_degree
    if isinstance(obj, SecretKey):
        cd = context.key_context_data()
        return tuple(obj.parms_id) == tuple(context.key_parms_id) and (
            obj.data[0].shape == (cd.coeff_modulus_size, cd.parms.poly_modulus_degree)
        )
    if isinstance(obj, PublicKey):
        return (
            tuple(obj.parms_id) == tuple(context.key_parms_id)
            and obj.data.is_ntt_form
            and is_metadata_valid_for(obj.data, context, allow_pure_key_levels=True)
        )
    if isinstance(obj, KSwitchKeys):
        if tuple(obj.parms_id) != tuple(context.key_parms_id):
            return False
        key_cd = context.key_context_data()
        L_key = key_cd.coeff_modulus_size
        n = key_cd.parms.poly_modulus_degree
        alpha = key_cd.parms.special_modulus_size
        data_count = len(context.first_context_data().key_moduli())
        decomp = -(-data_count // alpha)  # hybrid: one key per alpha-digit
        for k in obj.keys:
            if k is None:
                continue
            if k[0].shape != (decomp, 2, L_key, n):
                return False
        return True
    raise TypeError(f"unsupported object type {type(obj)}")


def is_buffer_valid(obj) -> bool:
    if isinstance(obj, Ciphertext):
        if obj.data is None:
            return False
        return obj.data[0].shape == obj.data[1].shape and obj.data[0].ndim == 3
    if isinstance(obj, Plaintext):
        return obj.rns_data is not None or obj.data is not None
    return True


def is_data_valid_for(obj, context: SEALContext) -> bool:
    """Coefficients must be < their modulus (host check for untrusted data)."""
    if isinstance(obj, Ciphertext):
        cd = context.get_context_data(obj.parms_id)
        data = obj.to_numpy()
        for j, q in enumerate(cd.key_moduli()):
            if (data[:, j, :] >= q).any():
                return False
        return True
    if isinstance(obj, Plaintext):
        if obj.rns_data is not None:
            cd = context.get_context_data(obj.parms_id)
            from seal_tpu.dtypes import to_host

            data = to_host(obj.rns_data)
            for j, q in enumerate(cd.key_moduli()):
                if (data[j] >= q).any():
                    return False
            return True
        scheme = context.key_context_data().parms.scheme
        if scheme in (SchemeType.BFV, SchemeType.BGV):
            t = context.key_context_data().parms.plain_modulus.value
            return bool((obj.data < t).all()) if len(obj.data) else True
        return True
    if isinstance(obj, (SecretKey, PublicKey)):
        cd = context.key_context_data()
        from seal_tpu.dtypes import to_host

        data = to_host(obj.data if isinstance(obj, SecretKey) else obj.data.data)
        arr = data if isinstance(obj, SecretKey) else data.reshape(-1, *data.shape[-2:])
        for j, q in enumerate(cd.key_moduli()):
            if isinstance(obj, SecretKey):
                if (arr[j] >= q).any():
                    return False
            else:
                if (arr[:, j, :] >= q).any():
                    return False
        return True
    if isinstance(obj, KSwitchKeys):
        # coefficient-range check per stored key tensor [decomp, 2, L_key, n]
        # (parity: valcheck.cpp:120-162 recurses into each PublicKey)
        cd = context.key_context_data()
        from seal_tpu.dtypes import to_host

        moduli = cd.key_moduli()
        for k in obj.keys:
            if k is None:
                continue
            data = to_host(k)
            for j, q in enumerate(moduli):
                if (data[:, :, j, :] >= q).any():
                    return False
        return True
    return True


def is_valid_for(obj, context: SEALContext) -> bool:
    """Complete validity check (valcheck.h is_valid_for family)."""
    return (
        is_metadata_valid_for(obj, context)
        and is_buffer_valid(obj)
        and is_data_valid_for(obj, context)
    )
