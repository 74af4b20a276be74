from seal_tpu.parallel.sharding import (
    HEMesh,
    batch_ciphertexts,
    unbatch_ciphertexts,
    shard_ciphertext,
    vmap_pipeline,
)
