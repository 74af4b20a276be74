from seal_tpu.parallel.sharding import (
    HEMesh,
    batch_ciphertexts,
    unbatch_ciphertexts,
    shard_ciphertext,
    vmap_pipeline,
)
from seal_tpu.parallel.keyswitch import TPEvaluator, TPKeySwitch, tp_relinearize
