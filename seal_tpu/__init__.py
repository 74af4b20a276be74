"""seal_tpu — a TPU-native homomorphic-encryption framework.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of Microsoft
SEAL 4.0 (as forked in shuangyichen/SEAL): the BFV, BGV, and CKKS schemes over
RNS polynomial rings Z_q[X]/(X^N + 1), including negacyclic NTT/INTT,
Barrett/Shoup modular arithmetic on 64-bit limb-decomposed coefficient
tensors, BEHZ RNS multiplication, key switching / relinearization, Galois
rotations, CKKS rescaling, the modulus-switching chain, seeded-PRNG
serialization, and multiparty (threshold) extensions.

Design stance (see SURVEY.md §7): host-side Python computes all per-context
constants with exact big-integer arithmetic; device-side compute runs on
uint32 limb-pair emulation of 64-bit modular arithmetic (TPU has no native
u64 multiply), vectorized over [L, N] RNS tensors, with Pallas kernels for
the hot loops and XLA collectives for multi-chip scaling.
"""

from seal_tpu.modulus import (
    CoeffModulus,
    Modulus,
    PlainModulus,
    SecLevelType,
)
from seal_tpu.encryption_params import (
    EncryptionParameters,
    SchemeType,
    parms_id_zero,
)
from seal_tpu.context import SEALContext
from seal_tpu.randomgen import PrngType
from seal_tpu.dtypes import (
    Ciphertext,
    GaloisKeys,
    KSwitchKeys,
    Plaintext,
    PublicKey,
    RelinKeys,
    SecretKey,
)
from seal_tpu.keygenerator import KeyGenerator
from seal_tpu.encryptor import Encryptor
from seal_tpu.decryptor import Decryptor
from seal_tpu.encoders import BatchEncoder
from seal_tpu.ckks import CKKSEncoder
from seal_tpu.evaluator import Evaluator
from seal_tpu.jit import JitEvaluator
from seal_tpu.serialization import ComprMode
from seal_tpu.valcheck import is_valid_for, is_metadata_valid_for
from seal_tpu import config

__version__ = "0.1.0"
